"""Strand-aware SV signature calling (sim/svcalls.py).

Records follow SAM convention: q_st/q_en are measured on the stored SEQ,
i.e. on the reverse complement of the read for '-' records.  A split
read sampled from the reverse strand must therefore yield the SAME
signature (kind, reference junction, size) as its forward-strand twin —
the round-3 regression these cases pin down (the pre-fix caller computed
'+'-only gap geometry and mis-called reverse-strand DELs as INSs).
"""

import numpy as np  # noqa: F401  (parity with the other test modules)

from vacmap_tpu.sim.svcalls import (
    call_signatures,
    cluster_calls,
    score_events,
)


def _rec(strand, q_st, q_en, r_st, r_en, cigar, contig="c"):
    return ["r1", contig, strand, q_st, q_en, r_st, r_en, 60, cigar]


def _split_calls(records):
    return [c for c in call_signatures(records) if c[0] != "CIGAR"]


def test_del_plus_strand():
    recs = [
        _rec("+", 0, 500, 4500, 5000, "500M500S"),
        _rec("+", 500, 1000, 5300, 5800, "500S500M"),
    ]
    assert ("DEL", "c", 5000, 300) in call_signatures(recs)


def test_del_minus_strand_matches_plus():
    # same molecule sequenced from the reverse strand: the read first
    # covers ref [5300,5800) then [4500,5000), both as '-' records whose
    # q coords live on the stored (revcomp) SEQ
    recs = [
        _rec("-", 500, 1000, 5300, 5800, "500S500M"),
        _rec("-", 0, 500, 4500, 5000, "500M500S"),
    ]
    assert ("DEL", "c", 5000, 300) in call_signatures(recs)


def test_ins_minus_strand():
    recs = [
        _rec("-", 800, 1300, 5000, 5500, "800S500M"),
        _rec("-", 0, 500, 4500, 5000, "500M800S"),
    ]
    assert ("INS", "c", 5000, 300) in call_signatures(recs)


def test_dup_plus_and_minus_agree():
    plus = [
        _rec("+", 0, 500, 5000, 5500, "500M500S"),
        _rec("+", 500, 1000, 5200, 5700, "500S500M"),
    ]
    minus = [
        _rec("-", 500, 1000, 5200, 5700, "500S500M"),
        _rec("-", 0, 500, 5000, 5500, "500M500S"),
    ]
    assert ("DUP", "c", 5200, 300) in call_signatures(plus)
    assert ("DUP", "c", 5200, 300) in call_signatures(minus)


def test_inv_emits_both_breakpoints():
    recs = [
        _rec("+", 0, 500, 4500, 5000, "500M600S"),
        _rec("-", 0, 600, 5000, 5600, "600M500S"),
    ]
    calls = call_signatures(recs)
    poss = sorted(pos for kind, _, pos, _ in calls if kind == "INV")
    assert poss == [5000, 5600]


def test_cigar_indels_and_clustering():
    recs = [_rec("+", 0, 1000, 4000, 5100, "300M100I300M100D400M")]
    calls = call_signatures(recs)
    assert ("INS", "c", 4300, 100) in calls
    assert ("DEL", "c", 4600, 100) in calls
    # clustering needs min_support reads
    ev = cluster_calls(calls * 2)
    kinds = {e[0] for e in ev}
    assert kinds == {"INS", "DEL"}
    assert cluster_calls(calls) == []  # support 1 < 2


def test_score_events_dup_ins_alias():
    truth = [["DUP", "c", 5200, 5500, 0, 1, 1]]
    events = [("INS", "c", 5210, 4)]
    recall, precision, n_truth, n_ev = score_events(truth, events)
    assert recall == 1.0 and precision == 1.0
