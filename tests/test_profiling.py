"""Profiling helper tests (StepTimer math; trace smoke on CPU)."""

import time

from nbody_tpu.utils.profiling import StepTimer, annotate


def test_step_timer_accumulates():
    t = StepTimer()
    for _ in range(3):
        with t.measure():
            time.sleep(0.001)
    assert len(t.times_s) == 3
    assert t.mean_us >= 1000
    assert t.best_us <= t.mean_us
    assert "3 calls" in t.summary()


def test_annotate_context():
    with annotate("test-region"):
        pass
