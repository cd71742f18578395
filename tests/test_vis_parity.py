"""Pixel-level parity of the overlay family vs the reference renderer.

Imports ``visualization/tao/utils/vis.py`` from /root/reference as the
oracle (cv2 is available in this image) and asserts our
:mod:`tao_amodal_tpu.utils.vis_ref` variants produce BIT-IDENTICAL
pixels for every label/offset/fill behavior."""

import sys

import numpy as np
import pytest

from tao_amodal_tpu.utils import vis_ref

from reference_oracle import _install_shims

REF_VIS_ROOT = "/root/reference/visualization"


@pytest.fixture(scope="module")
def ref_vis():
    _install_shims()
    if REF_VIS_ROOT not in sys.path:
        sys.path.insert(0, REF_VIS_ROOT)
    import tao.utils.vis as ref

    return ref


def _image(seed=0, h=140, w=200):
    return np.random.RandomState(seed).randint(
        0, 255, (h, w, 3), np.uint8)


def _annotations():
    return [
        {"bbox": [30.4, 20.6, 40.0, 25.0],
         "amodal_bbox": [25.0, 15.0, 50.0, 35.0],
         "amodal_is_uncertain": False, "track_id": 3,
         "category_id": 1, "score": 0.9},
        {"bbox": [90.0, 60.0, 30.0, 55.0],
         "amodal_bbox": [85.0, 55.0, 45.0, 70.0],
         "amodal_is_uncertain": True, "track_id": 7,
         "category_id": 2, "score": 0.4},
        {"amodal_bbox": [-10.0, 100.0, 30.0, 30.0],
         "segmentation": [[5.0, 6.0, 20.0, 6.0, 20.0, 18.0, 5.0,
                           18.0]],
         "amodal_is_uncertain": False, "track_id": 9,
         "category_id": 1},
    ]


CATS = {1: {"name": "baby"}, 2: {"name": "car"}}
COLORS = [(10.0, 200.0, 30.0), (200.0, 10.0, 30.0),
          (30.0, 10.0, 200.0)]


def test_vis_class_chip_parity(ref_vis):
    ours = vis_ref.vis_class(_image(1), (40, 60), "person (3)",
                             font_scale=0.5, bg_color=(10, 200, 30))
    ref = ref_vis.vis_class(_image(1), (40, 60), "person (3)",
                            font_scale=0.5, bg_color=(10, 200, 30))
    np.testing.assert_array_equal(ours, ref)


def test_vis_visibility_chip_parity(ref_vis):
    ours = vis_ref.vis_visibility(_image(2), (33, 44), "Vis: 0.512 O")
    ref = ref_vis.vis_visibility(_image(2), (33, 44), "Vis: 0.512 O")
    np.testing.assert_array_equal(ours, ref)


def test_vis_bbox_fill_parity(ref_vis):
    ours = vis_ref.vis_bbox(_image(3), [20.0, 30.0, 60.0, 40.0],
                            border_color=(1, 2, 3),
                            fill_color=(200.0, 100.0, 50.0),
                            fill_opacity=0.65, thickness=2)
    ref = ref_vis.vis_bbox(_image(3), [20.0, 30.0, 60.0, 40.0],
                           border_color=(1, 2, 3),
                           fill_color=(200.0, 100.0, 50.0),
                           fill_opacity=0.65, thickness=2)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("name,kwargs", [
    ("overlay_amodal_class_coco", {"show_track_id": True}),
    ("overlay_amodal_class_coco", {"oy": 7, "ox": 11}),
    ("overlay_amodal_class_prediction", {"show_track_id": False}),
    ("overlay_class_coco", {"show_track_id": True}),
    ("overlay_amodal_visibility_coco", {}),
])
def test_class_and_visibility_overlays(ref_vis, name, kwargs):
    anns = _annotations()
    if "class" in name and "amodal_class_prediction" not in name:
        pass
    if name in ("overlay_amodal_class_prediction", "overlay_class_coco"):
        anns = [a for a in anns if "bbox" in a]
    ours = getattr(vis_ref, name)(_image(4), anns, CATS, **kwargs)
    ref = getattr(ref_vis, name)(_image(4), anns, CATS, **kwargs)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("name,kwargs", [
    ("overlay_amodal_boxes_coco", {}),
    ("overlay_amodal_boxes_coco", {"fill_opacity": 0.4,
                                   "thickness": 2}),
    # NB the reference's overlay_{amodal,modal}_boxes_* crash on an
    # explicit border_color (they pass border_color=color AND **kwargs
    # — vis.py:387 TypeError); ours resolves explicit-wins, so only
    # overlay_boxes_coco (whose reference path works) tests it.
    ("overlay_boxes_coco", {"border_color": (5, 5, 5)}),
    ("overlay_modal_boxes_coco", {}),
    ("overlay_amodal_boxes_prediction", {"oy": 3, "ox": 5}),
    ("overlay_boxes_coco", {}),
])
def test_box_overlays(ref_vis, name, kwargs):
    anns = [a for a in _annotations() if "bbox" in a]
    ours = getattr(vis_ref, name)(_image(5), anns, colors=COLORS[:2],
                                  **kwargs)
    ref = getattr(ref_vis, name)(_image(5), anns, colors=COLORS[:2],
                                 **kwargs)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("modal", [True, False])
def test_transparent_except_bbox(ref_vis, modal):
    anns = _annotations()
    ours = vis_ref.transparent_except_bbox(_image(6), anns,
                                           modal=modal)
    ref = ref_vis.transparent_except_bbox(_image(6), anns, modal=modal)
    np.testing.assert_array_equal(ours, ref)


def test_visibility_label_formula(ref_vis):
    """Our label string matches the text the reference renders (checked
    via pixel equality of the full visibility overlay above); here the
    formula is also spot-checked directly: +1-convention IoU and the
    O/X uncertain marker, plus the segmentation-corner fallback."""
    anns = _annotations()
    assert vis_ref.amodal_visibility_label(anns[0]).startswith("Vis: ")
    assert vis_ref.amodal_visibility_label(anns[1]).endswith(" X")
    # Segmentation fallback uses corners 0/1 and 4/5.
    lbl = vis_ref.amodal_visibility_label(anns[2])
    assert lbl.endswith(" O") and "Vis: " in lbl


def test_color_assignment_order_matches_reference(ref_vis):
    """get_annotation_colors assigns palette rows by box-area rank; the
    permutation must match the reference's (palettes differ by design —
    ours is procedurally generated)."""
    anns = [a for a in _annotations() if "bbox" in a]

    def perm(colors, palette):
        rows = []
        for c in colors:
            d = np.abs(np.asarray(palette) - np.asarray(c)).sum(1)
            rows.append(int(d.argmin()))
        return rows

    ours = vis_ref.get_annotation_colors(anns)
    ref = ref_vis.get_annotation_colors(anns)
    from tao_amodal_tpu.utils.colormap import colormap as our_cmap

    assert perm(ours, our_cmap(rgb=True)) == perm(
        ref, ref_vis.colormap(rgb=True))
