"""AU heatmap aux module: geometry + rendering sanity."""
import numpy as np

from fvt_tpu.preprocess.action_units import (au_centers, au_heatmaps,
                                             batched_au_heatmaps)


def _synthetic_landmarks(cx=128.0, cy=128.0, scale=60.0):
    """Plausible 68-pt layout around a face center."""
    rng = np.random.default_rng(0)
    lms = np.zeros((68, 2), np.float32)
    lms[:, 0] = cx + rng.uniform(-scale, scale, 68)
    lms[:, 1] = cy + rng.uniform(-scale, scale, 68)
    # pin the anatomy-relevant points
    lms[36] = [cx - 45, cy - 20]   # left eye outer
    lms[39] = [cx - 15, cy - 20]   # left eye inner
    lms[42] = [cx + 15, cy - 20]   # right eye inner
    lms[45] = [cx + 45, cy - 20]   # right eye outer
    lms[21] = [cx - 12, cy - 40]
    lms[22] = [cx + 12, cy - 40]
    lms[19] = [cx - 30, cy - 45]
    lms[24] = [cx + 30, cy - 45]
    lms[31] = [cx - 12, cy + 15]
    lms[35] = [cx + 12, cy + 15]
    lms[48] = [cx - 25, cy + 45]
    lms[54] = [cx + 25, cy + 45]
    lms[51] = [cx, cy + 38]
    lms[57] = [cx, cy + 52]
    lms[8] = [cx, cy + 80]
    lms[27] = [cx, cy - 25]
    lms[33] = [cx, cy + 10]
    return lms


def test_au_centers_geometry():
    lms = _synthetic_landmarks()
    centers = au_centers(lms)
    assert set(centers) == {'AU1', 'AU2', 'AU4', 'AU6', 'AU9', 'AU12',
                            'AU25', 'AU26'}
    # AU1 sits above the inner brows
    assert (centers['AU1'][:, 1] < lms[21, 1] + 1).all()
    # AU12 at the mouth corners
    np.testing.assert_allclose(centers['AU12'][0], lms[48], atol=1e-5)


def test_au_heatmaps_peak_at_centers():
    lms = _synthetic_landmarks()
    maps = au_heatmaps(lms, image_size=256)
    centers = au_centers(lms)
    for name, m in maps.items():
        assert m.shape == (256, 256)
        # peak may fall between integer pixels; sigma ~2px -> >=0.9
        assert 0.9 <= m.max() <= 1.0 + 1e-6
        peak = np.unravel_index(np.argmax(m), m.shape)
        cands = centers[name]
        d = min(np.hypot(peak[1] - c[0], peak[0] - c[1]) for c in cands)
        assert d <= 2.0, (name, peak, cands)


def test_batched_au_heatmaps():
    lms = np.stack([_synthetic_landmarks(),
                    _synthetic_landmarks(cx=100, cy=140)])
    out = batched_au_heatmaps(lms, image_size=64)
    assert out.shape == (2, 8, 64, 64)
    assert np.isfinite(out).all()
