"""Profile resampling to the control period (SURVEY.md §2a time-series
alignment capability)."""

import numpy as np
import pandas as pd
import pytest

from pyhybridcontrol_tpu.io import profile_to_dataframe, resample_profile


def test_interp_from_series():
    # 15-min samples → 60-s control period
    s = pd.Series(
        [0.0, 1.0, 2.0],
        index=pd.date_range("2020-01-01", periods=3, freq="900s"))
    out = resample_profile(s, Ts=60.0)
    assert out.shape == (31,)
    assert out[0] == 0.0
    np.testing.assert_allclose(out[15], 1.0, atol=1e-12)
    np.testing.assert_allclose(np.diff(out), 1 / 15, atol=1e-12)


def test_hold_tariff():
    # TOU tariff: step at t=3600 must NOT be interpolated
    t = np.array([0.0, 3600.0])
    v = np.array([0.10, 0.30])
    out = resample_profile((t, v), Ts=900.0, T=6, how="hold")
    np.testing.assert_allclose(out, [0.10, 0.10, 0.10, 0.10, 0.30, 0.30])


def test_mean_conserves_demand():
    # fine-grained demand averaged into coarse control periods
    t = np.arange(0, 3600, 60.0)
    v = np.sin(t / 500.0) + 2.0
    out = resample_profile((t, v), Ts=900.0, T=4, how="mean")
    for k in range(4):
        m = (t >= 900 * k) & (t < 900 * (k + 1))
        np.testing.assert_allclose(out[k], v[m].mean(), atol=1e-12)


def test_array_passthrough_and_roundtrip():
    v = np.array([1.0, 2.0, 3.0])
    np.testing.assert_array_equal(resample_profile(v, Ts=60.0), v)
    s = profile_to_dataframe(v, Ts=60.0)
    assert isinstance(s, pd.Series)
    back = resample_profile(s, Ts=60.0)
    np.testing.assert_allclose(back, v)


def test_unknown_mode_raises():
    with pytest.raises(ValueError):
        resample_profile((np.arange(3.0), np.arange(3.0)), Ts=1.0,
                         how="nearest")
