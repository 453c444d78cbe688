from vacmap_tpu import trace


def test_trace_spans():
    trace.reset()
    trace.enable(True)
    try:
        with trace.span("stage_a"):
            pass
        with trace.span("stage_a"):
            pass
        with trace.span("stage_b"):
            pass
        s = trace.summary()
        assert "stage_a" in s and "stage_b" in s
    finally:
        trace.enable(False)
        trace.reset()


def test_trace_disabled_noop():
    trace.reset()
    with trace.span("x"):
        pass
    assert "no spans" in trace.summary()
