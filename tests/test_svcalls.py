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


def _rec(strand, q_st, q_en, r_st, r_en, cigar, contig="c", rid="r1"):
    return [rid, contig, strand, q_st, q_en, r_st, r_en, 60, cigar]


def _sig(calls):
    """(kind, contig, pos, size) views of calls (drop the readid)."""
    return [c[:4] for c in calls]


def _split_calls(records):
    return [c for c in call_signatures(records) if c[0] != "CIGAR"]


def test_del_plus_strand():
    recs = [
        _rec("+", 0, 500, 4500, 5000, "500M500S"),
        _rec("+", 500, 1000, 5300, 5800, "500S500M"),
    ]
    assert ("DEL", "c", 5000, 300) in _sig(call_signatures(recs))


def test_del_minus_strand_matches_plus():
    # same molecule sequenced from the reverse strand: the read first
    # covers ref [5300,5800) then [4500,5000), both as '-' records whose
    # q coords live on the stored (revcomp) SEQ
    recs = [
        _rec("-", 500, 1000, 5300, 5800, "500S500M"),
        _rec("-", 0, 500, 4500, 5000, "500M500S"),
    ]
    assert ("DEL", "c", 5000, 300) in _sig(call_signatures(recs))


def test_ins_minus_strand():
    recs = [
        _rec("-", 800, 1300, 5000, 5500, "800S500M"),
        _rec("-", 0, 500, 4500, 5000, "500M800S"),
    ]
    assert ("INS", "c", 5000, 300) in _sig(call_signatures(recs))


def test_dup_plus_and_minus_agree():
    plus = [
        _rec("+", 0, 500, 5000, 5500, "500M500S"),
        _rec("+", 500, 1000, 5200, 5700, "500S500M"),
    ]
    minus = [
        _rec("-", 500, 1000, 5200, 5700, "500S500M"),
        _rec("-", 0, 500, 5000, 5500, "500M500S"),
    ]
    assert ("DUP", "c", 5200, 300) in _sig(call_signatures(plus))
    assert ("DUP", "c", 5200, 300) in _sig(call_signatures(minus))


def test_inv_emits_both_breakpoints():
    recs = [
        _rec("+", 0, 500, 4500, 5000, "500M600S"),
        _rec("-", 0, 600, 5000, 5600, "600M500S"),
    ]
    calls = call_signatures(recs)
    poss = sorted(c[2] for c in calls if c[0] == "INV")
    assert poss == [5000, 5600]


def test_cigar_indels_and_clustering():
    recs = [_rec("+", 0, 1000, 4000, 5100, "300M100I300M100D400M")]
    calls = call_signatures(recs)
    assert ("INS", "c", 4300, 100) in _sig(calls)
    assert ("DEL", "c", 4600, 100) in _sig(calls)
    # clustering needs min_support DISTINCT reads
    recs2 = [_rec("+", 0, 1000, 4000, 5100, "300M100I300M100D400M",
                  rid="r2")]
    ev = cluster_calls(calls + call_signatures(recs2))
    kinds = {e[0] for e in ev}
    assert kinds == {"INS", "DEL"}
    assert cluster_calls(calls) == []  # support 1 < 2
    # the same read twice is still ONE supporting read
    assert cluster_calls(calls * 2) == []


def test_score_events_dup_ins_alias():
    truth = [["DUP", "c", 5200, 5500, 0, 1, 1]]
    events = [("INS", "c", 5210, 4)]
    recall, precision, n_truth, n_ev = score_events(truth, events)
    assert recall == 1.0 and precision == 1.0


def test_single_spanning_read_cannot_self_support_inv():
    """A read spanning a whole inversion sees both junctions; its two
    emissions per breakpoint must count as ONE supporting read
    (ADVICE round-3 medium finding)."""
    def spanning(rid):
        return [
            _rec("+", 0, 2000, 28000, 30000, "2000M3500S", rid=rid),
            _rec("-", 2000, 3500, 30000, 31500, "2000S1500M2000S",
                 rid=rid),
            _rec("+", 3500, 5500, 31500, 33500, "3500S2000M", rid=rid),
        ]
    one = call_signatures(spanning("rA"))
    # per-read dedup: each breakpoint emitted once
    assert sorted(c[2] for c in one if c[0] == "INV") == [30000, 31500]
    assert cluster_calls(one) == []
    two = one + call_signatures(spanning("rB"))
    ev = sorted(e for e in cluster_calls(two) if e[0] == "INV")
    assert [(e[2], e[3]) for e in ev] == [(30000, 2), (31500, 2)]


def test_ins_truth_length_is_not_a_breakpoint():
    """vacsim INS truth rows are (INS, contig, st, LENGTH): an event
    near position==length must NOT match (ADVICE round-3 low finding)."""
    truth = [["INS", "c", 350000, 300]]
    bogus = [("INS", "c", 400, 4)]
    recall, precision, _, _ = score_events(truth, bogus)
    assert recall == 0.0 and precision == 0.0
    good = [("INS", "c", 350100, 4)]
    recall, precision, _, _ = score_events(truth, good)
    assert recall == 1.0 and precision == 1.0
