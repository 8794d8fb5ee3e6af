"""The bit-parallel InDel distance is exactly the classic DP."""

from __future__ import annotations

import random

from indonesian_id_ocr_service_spark.functions.fuzzy import indel_distance


def _indel_dp(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return la + lb
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i]
        ca = a[i - 1]
        for j in range(1, lb + 1):
            if ca == b[j - 1]:
                cur.append(prev[j - 1])
            else:
                cur.append(1 + min(prev[j], cur[-1]))
        prev = cur
    return prev[lb]


def test_bitparallel_equals_dp():
    rng = random.Random(7)
    for _ in range(30000):
        n1, n2 = rng.randint(0, 40), rng.randint(0, 40)
        a = "".join(rng.choice("abcdef 0123") for _ in range(n1))
        b = "".join(rng.choice("abcdef 0123") for _ in range(n2))
        assert indel_distance(a, b) == _indel_dp(a, b), (a, b)


def test_bitparallel_long_strings():
    rng = random.Random(11)
    for _ in range(300):
        n1, n2 = rng.randint(60, 200), rng.randint(60, 200)
        a = "".join(rng.choice("abcdefgh") for _ in range(n1))
        b = "".join(rng.choice("abcdefgh") for _ in range(n2))
        assert indel_distance(a, b) == _indel_dp(a, b), (a, b)
