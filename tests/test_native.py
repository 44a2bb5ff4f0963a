"""Native (C++) runtime tests: ring-buffer sync + CSV writer."""

import numpy as np
import pytest

from cerberus_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def make_sample(t):
    return (t, np.full(3, t), np.full(3, -t), np.full(12, 2 * t),
            np.full(12, 3 * t), np.array([1.0, 0, 1, 0]))


def test_push_extract_with_boundaries():
    s = native.SensorSync(1024)
    for k in range(100):
        s.push(*make_sample(k * 0.002))
    assert s.size() == 100
    assert abs(s.latest_time() - 0.198) < 1e-12

    out = s.extract(0.0101, 0.0501)
    assert out is not None
    # boundary samples interpolated at exactly t0 and t1
    np.testing.assert_allclose(out[0, 0], 0.0101, atol=1e-12)
    np.testing.assert_allclose(out[-1, 0], 0.0501, atol=1e-12)
    # interior samples are the raw stream
    np.testing.assert_allclose(out[1, 0], 0.012, atol=1e-12)
    # linear fields interpolate linearly (acc == t)
    np.testing.assert_allclose(out[0, 1], 0.0101, atol=1e-12)
    # consecutive extraction continues seamlessly
    out2 = s.extract(0.0501, 0.1001)
    np.testing.assert_allclose(out2[0, 0], 0.0501, atol=1e-12)
    np.testing.assert_allclose(out2[-1, 0], 0.1001, atol=1e-12)


def test_extract_insufficient_data():
    s = native.SensorSync(64)
    for k in range(5):
        s.push(*make_sample(k * 0.002))
    assert s.extract(0.0, 1.0) is None  # stream hasn't reached t1


def test_ring_overwrite():
    s = native.SensorSync(16)
    for k in range(100):
        s.push(*make_sample(k * 0.002))
    assert s.size() == 16
    out = s.extract(0.19, 0.197)
    assert out is not None
    assert (out[:, 0] >= 0.168).all()


def test_csv_writer(tmp_path):
    p = str(tmp_path / "out.csv")
    w = native.CsvWriter(p, "a,b,c")
    w.row([1.0, 2.5, -3.25])
    w.row([4, 5, 6])
    w.close()
    lines = open(p).read().strip().splitlines()
    assert lines[0] == "a,b,c"
    assert lines[1] == "1,2.5,-3.25"
