"""Layer schedule parity (mirrors /root/reference/src/index/tests.rs:305-335)."""

from granne_tpu.index import schedule


def test_layer_counts_small():
    # 15^0..: with multiplier 15, total 1000 -> floor(log15(1000)) = 2 -> 3 layers
    counts = schedule.layer_counts(1000, 15.0)
    assert counts[-1] == 1000
    assert len(counts) == 3
    # each layer ~15x the previous
    assert counts == [5, 67, 1000]


def test_layer_counts_billion():
    # analytic 1e9 case as in the reference tests
    total = 1_000_000_000
    counts = schedule.layer_counts(total, 15.0)
    assert counts[-1] == total
    assert len(counts) == 8  # floor(log15(1e9)) + 1
    for a, b in zip(counts, counts[1:-1]):
        assert 15 * (a - 1) < b <= 15 * a  # geometric within ceil rounding


def test_monotone_and_capped():
    for total in [1, 2, 14, 15, 16, 225, 226, 5000]:
        counts = schedule.layer_counts(total, 15.0)
        assert counts[-1] == total
        assert all(a <= b for a, b in zip(counts, counts[1:]))


def test_exact_formula_matches_reference_definition():
    import math

    for total in [10, 100, 1234, 100_000]:
        for mult in [5.0, 15.0, 20.0]:
            top = math.floor(math.log(total) / math.log(mult))
            for i in range(top + 1):
                expected = min(math.ceil(total / mult ** (top - i)), total)
                assert schedule.num_elements_in_layer(total, mult, i) == expected
