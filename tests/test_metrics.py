import numpy as np
import jax.numpy as jnp

from pixelpick_tpu.utils.metrics import RunningScore, confusion_matrix, AverageMeter


def _torch_reference_scores(lt, lp, n):
    """Independent numpy re-derivation of the reference formulas
    (utils/metrics.py:167-204) used as oracle."""
    mask = (lt >= 0) & (lt < n)
    hist = np.bincount(n * lt[mask].astype(int) + lp[mask], minlength=n * n).reshape(n, n)
    acc = np.diag(hist).sum() / hist.sum()
    iu = np.diag(hist) / (hist.sum(1) + hist.sum(0) - np.diag(hist))
    return hist, acc, np.nanmean(iu)


def test_confusion_matrix_matches_reference_semantics():
    rng = np.random.default_rng(0)
    n = 11
    lt = rng.integers(0, n + 1, size=(4, 36, 48))  # includes ignore_index == n
    lp = rng.integers(0, n, size=(4, 36, 48))
    hist_ref, acc_ref, miou_ref = _torch_reference_scores(lt.ravel(), lp.ravel(), n)

    hist_dev = np.asarray(confusion_matrix(jnp.asarray(lt), jnp.asarray(lp), n))
    np.testing.assert_array_equal(hist_dev, hist_ref)

    rs = RunningScore(n)
    rs.update(jnp.asarray(lt), jnp.asarray(lp))
    scores, cls_iu = rs.get_scores()
    assert np.isclose(scores["Pixel Acc"], acc_ref)
    assert np.isclose(scores["Mean IoU"], miou_ref, equal_nan=True)
    assert len(cls_iu) == n


def test_running_score_accumulates_numpy_and_device():
    n = 5
    rng = np.random.default_rng(1)
    lt1 = rng.integers(0, n, (10, 10))
    lp1 = rng.integers(0, n, (10, 10))
    lt2 = rng.integers(0, n, (10, 10))
    lp2 = rng.integers(0, n, (10, 10))

    rs = RunningScore(n)
    rs.update(lt1, lp1)
    rs.update(jnp.asarray(lt2), jnp.asarray(lp2))

    both = RunningScore(n)
    both.update(np.stack([lt1, lt2]), np.stack([lp1, lp2]))
    np.testing.assert_allclose(rs.confusion, both.confusion)

    rs.reset()
    assert rs.confusion.sum() == 0


def test_average_meter():
    m = AverageMeter()
    m.update(2.0)
    m.update(4.0)
    assert m.avg == 3.0
    m.update(4.0, weight=2)
    assert np.isclose(m.avg, (2 + 4 + 8) / 4)
