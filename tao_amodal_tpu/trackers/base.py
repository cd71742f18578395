"""Single-object tracker host API.

Capability-parity with the reference SOT abstraction
(``visualization/tao/trackers/sot/base.py``): ``init(image, box)``,
``update(image)``, a timing generator ``track_yield``, and batch
``track`` over a frame list with optional rendered output.  The device
work happens inside subclass ``init``/``update`` (jitted steps); this
layer is host orchestration + IO only.
"""

from __future__ import annotations

import abc
import time
from collections import namedtuple

import numpy as np

TrackResult = namedtuple("TrackResult", ["box", "score", "elapsed"])


class Tracker(abc.ABC):
    @abc.abstractmethod
    def init(self, image, box):
        """Start tracking ``box`` (xywh) in ``image`` (RGB uint8)."""

    @abc.abstractmethod
    def update(self, image):
        """Advance one frame; returns (box_xywh, score)."""

    def track_yield(self, images):
        """Yield per-frame :class:`TrackResult` with wall-clock timing
        (capability of reference ``base.py:59-102``)."""
        for f, image in enumerate(images):
            start = time.time()
            if f == 0:
                box, score = self.init_frame(image)
            else:
                box, score = self.update(image)
            yield TrackResult(np.asarray(box), float(score),
                              time.time() - start)

    def init_frame(self, image):
        raise RuntimeError(
            "call track(images, init_box) or init() before track_yield")

    def track(self, images, init_box, return_all=True):
        """Track through a frame sequence.

        Args:
          images: iterable of RGB uint8 arrays (or paths; loaded via
            PIL when strings).
          init_box: xywh box in the first frame.

        Returns (boxes [T, 4] xywh, scores [T], times [T]).
        """
        from PIL import Image

        boxes, scores, times = [], [], []
        for f, im in enumerate(images):
            if isinstance(im, str):
                im = np.asarray(Image.open(im).convert("RGB"))
            start = time.time()
            if f == 0:
                self.init(im, init_box)
                box, score = np.asarray(init_box, float), 1.0
            else:
                box, score = self.update(im)
            boxes.append(np.asarray(box))
            scores.append(score)
            times.append(time.time() - start)
        if return_all:
            return np.stack(boxes), np.asarray(scores), np.asarray(times)
        return boxes[-1], scores[-1], times[-1]
