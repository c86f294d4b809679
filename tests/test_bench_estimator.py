"""Unit pins for bench.py's step-aligned steady estimator (no Spark).

The estimator fits a slope over epoch-commit STEP points; the advisor-r11
fix requires the left endpoint to be a genuine step in the FULL series,
never a mid-plateau repeat of the warm-threshold crossing.
"""

import importlib.util
import os

_BENCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
)


def _bench():
    spec = importlib.util.spec_from_file_location("bench_mod", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _step_series(epochs, period_s, per_epoch, sample_dt=0.25):
    """Synthetic sampler output for an ideal epoch-burst pipeline: count
    jumps by per_epoch exactly at each period boundary; the sampler polls
    every sample_dt so plateaus repeat between bursts."""
    samples = []
    t = 0.0
    end = epochs * period_s + period_s
    while t <= end:
        done = min(int(t // period_s), epochs) * per_epoch
        samples.append((t, done))
        t += sample_dt
    return samples


def test_ideal_step_series_recovers_exact_rate():
    b = _bench()
    n = 1000
    samples = _step_series(epochs=10, period_s=2.0, per_epoch=100)
    rate, window, subs, band, cons = b.steady_estimate(samples, n)
    # true throughput is 100 rows / 2 s = 50/s; step alignment must recover
    # it exactly (wall-clock windows would be off by up to a burst)
    assert abs(rate - 50.0) < 1e-6
    assert cons == 1.0
    assert band is not None and band < 1e-6


def test_left_endpoint_is_a_genuine_step_not_a_plateau_repeat():
    """advisor r11: a warm-threshold crossing observed mid-plateau must not
    seed the window. Construct a series where the 25% floor (250) lands
    mid-plateau: steps at t=2 (300) and every 2 s after. A plateau-repeat
    seed at t=2.25+ would stretch the window and bias the rate low."""
    b = _bench()
    n = 1200  # floor = 300, reached exactly at the t=2.0 step
    samples = _step_series(epochs=8, period_s=2.0, per_epoch=150)
    rate, window, subs, band, cons = b.steady_estimate(samples, n)
    assert abs(rate - 75.0) < 1e-6, "plateau repeat biased the slope"


def test_degenerate_series_yield_zero_rate():
    b = _bench()
    # fewer than 2 steps above the floor
    assert b.steady_estimate([(0.0, 0), (1.0, 0)], 100)[0] == 0.0
    assert b.steady_estimate([], 100)[0] == 0.0
    # single burst completes everything: one step, no slope
    one = [(0.0, 0), (0.5, 0), (1.0, 100), (1.5, 100)]
    assert b.steady_estimate(one, 100)[0] == 0.0


def test_estimator_invariant_to_sampler_phase_and_rate():
    """Property: for ANY ideal epoch-burst pipeline, the step-aligned slope
    recovers the true per-epoch rate regardless of the sampler's polling
    period or phase offset — the exact failure mode of the retired
    wall-clock estimator (and of the pre-r11 warm[0] seeding, which biased
    the slope by a sampler-phase-dependent amount)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    b = _bench()

    @settings(max_examples=60, deadline=None)
    @given(
        period=st.floats(0.5, 5.0),
        per_epoch=st.integers(10, 500),
        epochs=st.integers(5, 30),
        dt=st.floats(0.05, 0.45),
        phase=st.floats(0.0, 0.45),
    )
    def check(period, per_epoch, epochs, dt, phase):
        n = epochs * per_epoch
        samples = []
        t = phase
        while t <= epochs * period + period:
            done = min(int(t // period), epochs) * per_epoch
            samples.append((t, done))
            t += dt
        rate, window, subs, band, cons = b.steady_estimate(samples, n)
        true = per_epoch / period
        # the estimator sees each step at the first poll AFTER the burst,
        # so each endpoint carries up to dt of observation lag; with >= 2
        # steps the slope error is bounded by dt on a >= period window
        if rate > 0:
            assert abs(rate - true) / true <= dt / period + 1e-9, (
                period, per_epoch, epochs, dt, phase, rate, true,
            )

    check()
