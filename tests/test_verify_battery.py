"""CI smoke of the on-chip verification battery (utils/verify.py).

Runs the same tier functions the driver artifact (VERIFY_r05.json) comes
from, in CPU interpret mode at small shapes — guards the battery itself
(a broken tier must fail CI, not silently report PASSED on the chip).
"""

from ldpc_erasure_codes_tpu.utils.verify import run_battery


def test_battery_quick_all_passed():
    results = run_battery(interpret=True, quick=True)
    assert [r["tier"] for r in results] == [
        "binary_unrolled",
        "binary_seq",
        "nb_unrolled",
        "hybrid_ge",
        "rs_wide",
    ]
    for r in results:
        assert r["status"] == "PASSED", r
    # The hybrid tier must actually have exercised the GE fallback.
    hy = next(r for r in results if r["tier"] == "hybrid_ge")
    assert hy["ge_frames"] > 0
