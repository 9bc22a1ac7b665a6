"""Driver-contract invariants of __spark_entry__ (ADVICE r6): registry and
oracle keys agree, and — the deferral guard — every query changed in the
current round sits inside the driver's 50-entry gate window, so a change
can never ship with only local coverage again."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry  # noqa: E402


def test_registry_and_oracles_align():
    qs = list(entry.queries())
    os_ = list(entry.oracle_sql())
    # every oracle belongs to a registered query (queries without an oracle
    # get the driver's weaker rows-only check, which is allowed)
    assert set(os_) <= set(qs)
    # the gate ordering puts ungated entries first and is a permutation
    assert sorted(qs) == sorted(set(qs)) and len(qs) >= 136


def test_changed_queries_sit_inside_gate_window():
    qs = list(entry.queries())
    window = set(qs[: entry.GATE_WINDOW])
    missing = [n for n in entry._CHANGED_IN_ROUND if n not in window]
    assert not missing, (
        f"changed-in-round queries outside the driver's {entry.GATE_WINDOW}-"
        f"entry gate window: {missing} — reorder _GATED_GREEN"
    )
    # and the rotation pays the r11 rotation debt (VERDICT r11 item 1):
    # the changed set leads, then the r7-green block (stalest driver rows)
    # and the 30 remaining r10-green entries r11's rotation pushed out
    # fill the window to exactly 50
    for name in (
        # r7-green block (driver rows 5 rounds old at r12)
        "q24_select_edges_batch", "x07_embedding_neardup", "x08_quality",
        "x09_token_count", "x10_lang_id", "x11_fingerprint",
        "x12_multimodal", "x13_degree_dist",
        "x19_pipeline", "x20_sessionization", "x21_asof_join",
        "x22_range_join", "x23_rollup", "x24_event_rollup",
        "x26_topk_per_group",
        # spot-checks of the r10-green re-gate block
        "q01_point_lookup", "x96_salted_join", "x34_decontaminate",
    ):
        assert name in window
