import numpy as np

from kasa_tpu.host.dtoa import dtoa, ftoa, cpp_default


def test_basic_values():
    assert dtoa(0.0) == "0.0"
    assert dtoa(1.0) == "1.0"
    assert dtoa(-1.5) == "-1.5"
    assert dtoa(0.3) == "0.3"
    assert dtoa(12.34) == "12.34"
    assert dtoa(0.001234) == "0.001234"
    assert dtoa(float("nan")) == "NaN"
    assert dtoa(float("inf")) == "inf"
    assert dtoa(1e30) == "1e30"
    assert dtoa(1.234e33) == "1.234e33"
    assert dtoa(1e-7) == "1e-7"
    assert dtoa(12340000000.0) == "12340000000.0"


def test_values_from_golden_json():
    # doubles whose reference output (from the golden identify run) is known
    assert dtoa(float("48.93761444091797")) == "48.93761444091797"
    assert dtoa(2.7071876493905385) == "2.7071876493905386"  # OOB-read quirk
    assert dtoa(0.017948031425476074) == "0.017948031425476075"
    assert dtoa(52.336021423339844) == "52.336021423339847"
    assert dtoa(0.2750440537929535) == "0.2750440537929535"


def test_float32_path():
    assert ftoa(np.float32(1.0)) == "1.0"
    assert ftoa(np.float32(0.1)) == "0.10000000149011612"


def test_cpp_default():
    assert cpp_default(0.624147) == "0.624147"
    assert cpp_default(0.0575167) == "0.0575167"
    assert cpp_default(0.0) == "0"
    assert cpp_default(1846.0) == "1846"
