"""pr_curves vs a direct transcription of the protocol accumulation.

The spec loop mirrors reference eval.py:539-573: cumulative TP/FP,
precision with eps guard, right-to-left max interpolation, searchsorted
sampling with IndexError-equivalent zero fill.
"""

import numpy as np

from tao_amodal_tpu.ops.pr import pr_curves

REC_THRS = np.linspace(0.0, 1.0, 101)


def _spec(tps, fps, num_gt, rec_thrs):
    T, N = tps.shape
    precision = np.zeros((T, len(rec_thrs)))
    recall = np.zeros(T)
    tp_sum = np.cumsum(tps, axis=1).astype(float)
    fp_sum = np.cumsum(fps, axis=1).astype(float)
    for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
        num_tp = len(tp)
        rc = tp / num_gt
        recall[t] = rc[-1] if num_tp else 0
        pr = (tp / (fp + tp + np.spacing(1))).tolist()
        for i in range(num_tp - 1, 0, -1):
            if pr[i] > pr[i - 1]:
                pr[i - 1] = pr[i]
        idxs = np.searchsorted(rc, rec_thrs, side="left")
        pr_at = [0.0] * len(rec_thrs)
        try:
            for j, pi in enumerate(idxs):
                pr_at[j] = pr[pi]
        except IndexError:
            pass
        precision[t] = pr_at
    return precision, recall


def test_vs_spec_random():
    rng = np.random.RandomState(11)
    for _ in range(40):
        T, N = 10, rng.randint(1, 30)
        matched = rng.rand(T, N) < 0.4
        ignored = rng.rand(T, N) < 0.2
        tps = matched & ~ignored
        fps = ~matched & ~ignored
        num_gt = rng.randint(1, 20)
        exp_p, exp_r = _spec(tps, fps, num_gt, REC_THRS)
        got_p, got_r = pr_curves(tps, fps, num_gt, REC_THRS)
        np.testing.assert_allclose(got_p, exp_p, atol=1e-12)
        np.testing.assert_allclose(got_r, exp_r, atol=1e-12)


def test_empty():
    p, r = pr_curves(np.zeros((10, 0), bool), np.zeros((10, 0), bool), 5,
                     REC_THRS)
    assert p.shape == (10, 101) and (p == 0).all()
    assert (r == 0).all()
