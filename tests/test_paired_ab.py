"""Unit tests for the paired A/B protocol's statistics (tools/paired_ab.py)."""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.paired_ab import _parse_env, sign_test_p


def test_sign_test_exact_binomial():
    # all 6 pairs the same direction: p = 2 * (1/2)^6 = 0.03125
    assert math.isclose(sign_test_p([1.1] * 6), 2 / 64)
    # 3 up, 3 down: p = 1 (no evidence)
    assert sign_test_p([1.1, 1.1, 1.1, 0.9, 0.9, 0.9]) == 1.0
    # ties dropped
    assert math.isclose(sign_test_p([1.0, 1.0, 1.1, 1.1, 1.1, 1.1, 1.1]),
                        2 / 32)
    # empty / all-ties -> 1.0
    assert sign_test_p([]) == 1.0
    assert sign_test_p([1.0, 1.0]) == 1.0
    # 5/6 one way: p = 2 * (C(6,0)+C(6,1))/64 = 14/64
    assert math.isclose(sign_test_p([1.1, 1.1, 1.1, 1.1, 1.1, 0.9]),
                        14 / 64)


def test_parse_env():
    assert _parse_env(["A=1,B=x", "C=3"]) == {"A": "1", "B": "x", "C": "3"}
    assert _parse_env(None) == {}
    assert _parse_env(["K=a=b"]) == {"K": "a=b"}
