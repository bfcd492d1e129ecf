"""Property-based tests (hypothesis) for DSP/vision invariants."""

import numpy as np

from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from vaudio import dsp, vision
from vaudio.config import AuralizerConfig

CFG = AuralizerConfig()
FREQS = CFG.bin_frequencies()


finite_f = st.floats(min_value=0.0, max_value=30000.0, allow_nan=False,
                     allow_infinity=False, width=32)


@settings(max_examples=50, deadline=None)
@given(st.lists(finite_f, min_size=1, max_size=32))
def test_find_closest_index_is_nearest(targets):
    targets = np.asarray(targets, np.float32)
    idx = np.asarray(dsp.find_closest_index(FREQS, targets))
    # The returned bin is never farther than any other bin (global nearest,
    # up to the documented tie-break).
    chosen = np.abs(FREQS[idx] - targets)
    best = np.min(np.abs(FREQS[None, :] - targets[:, None]), axis=1)
    np.testing.assert_allclose(chosen, best, rtol=1e-6, atol=1e-3)


@settings(max_examples=30, deadline=None)
@given(st.floats(0.0, 1.0, width=32), st.floats(0.0, 1.0, width=32),
       st.floats(0.0, 1.0, width=32))
def test_rgb_to_hsi_ranges(r, g, b):
    h, s, i = (float(x) for x in np.asarray(
        vision.rgb_to_hsi(np.asarray([r, g, b], np.float32))))
    assert 0.0 <= h <= 1.0
    assert -1e-6 <= s <= 1.0 + 1e-6
    assert abs(i - (r + g + b) / 3.0) < 1e-5


@settings(max_examples=20, deadline=None)
@given(st.floats(0.0009765625, 8.0, width=32),
       st.floats(0.0009765625, 8.0, width=32),
       st.floats(0.0, 1.0, width=32), st.floats(0.0, 1.0, width=32))
def test_agc_output_bounded(peak_scale, rmax, attack, release):
    rng = np.random.default_rng(0)
    sig = (rng.normal(size=256) * peak_scale).astype(np.float32)
    out, new_max = dsp.agc_normalize(jnp.asarray(sig), jnp.float32(rmax),
                                     jnp.float32(attack),
                                     jnp.float32(release))
    out = np.asarray(out)
    assert np.all(np.isfinite(out))
    # Normalized output never exceeds unity peak by construction
    # (framePeak / normValue = normFactor <= 1).
    assert np.abs(out).max() <= 1.0 + 1e-5
    assert float(new_max) > 0.0


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 359), st.integers(0, 359), st.floats(0, 1, width=32))
def test_hue_ema_between_endpoints(prev, target, mixing):
    hist = np.zeros((16, 360), np.float32)
    hist[:, target] = 100.0
    out = np.asarray(vision.update_hues(
        jnp.asarray(hist), jnp.full(16, prev, jnp.int32),
        jnp.float32(mixing), CFG))
    lo, hi = min(prev, target), max(prev, target)
    assert np.all((out >= lo - 1) & (out <= hi + 1))


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_overlap_add_stream_energy_bounded(seed):
    # Repeated OLA of unit-peak frames stays bounded (COLA-ish stability).
    rng = np.random.default_rng(seed)
    w = jnp.asarray(dsp.hann_window_norm(1024))
    tail = jnp.zeros(1024, jnp.float32)
    peak = 0.0
    for _ in range(6):
        sig = jnp.asarray(rng.normal(size=1024).astype(np.float32))
        out, tail = dsp.overlap_add(sig, tail, w)
        peak = max(peak, float(jnp.max(jnp.abs(out))))
    assert peak <= 2 * float(jnp.max(w))


# ---------------------------------------------------------------------------
# Serving-layer invariants (round 3: push queue discipline, lease policy)
# ---------------------------------------------------------------------------

@settings(max_examples=40, deadline=None)
@given(st.integers(1, 8),
       st.lists(st.tuples(st.booleans(), st.integers(0, 999)),
                min_size=0, max_size=64))
def test_push_source_queue_discipline(maxsize, ops):
    """The push queue's contract under any push/pop interleaving:
    newest frames win (drops are always the OLDEST queued), fill never
    exceeds maxsize, nothing is reordered, and conservation holds
    (pushed == delivered + dropped + still queued)."""
    from vaudio.io import PushSource
    ps = PushSource(maxsize=maxsize, when_empty="dark")
    it = ps.frames()
    delivered, expect = [], []       # expect = what SHOULD be queued
    for is_push, val in ops:
        if is_push:
            ps.push(val)
            expect.append(val)
            if len(expect) > maxsize:
                expect.pop(0)        # oldest-drop
        else:
            got = next(it)
            if expect:
                assert got == expect.pop(0)
                delivered.append(got)
            else:
                assert got is None   # dark idle tick
        assert ps.fill == len(expect) <= maxsize
    assert ps.pushed == ps.dropped + len(delivered) + ps.fill


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 12), st.sets(st.integers(0, 11)),
       st.integers(1, 12),
       st.one_of(st.none(), st.integers(1, 4)))
def test_idle_shrink_targets_trailing_free_run_only(n, free, stop,
                                                    mesh_step):
    """runtime.multistream.trailing_shrink_target — the ONE derivation
    behind idle auto-shrink, its apply-time revalidation, and
    release_slot(shrink=True): it removes at most the maximal TRAILING
    run of free slots (never an inner hole), respects the stop floor,
    rounds up to the mesh multiple, and never goes below one slot."""
    from vaudio.runtime.multistream import trailing_shrink_target
    free = {i for i in free if i < n}
    base = trailing_shrink_target(n, free, stop=stop)
    # Floor and range.
    assert min(n, max(1, stop)) <= base <= n
    # Everything removed was free (no inner hole is ever shrunk) ...
    assert all(i in free for i in range(base, n))
    # ... and nothing free-and-trailing survives (maximality), unless
    # a floor stopped us.
    if base > max(1, stop):
        assert (base - 1) not in free
    n_new = trailing_shrink_target(n, free, stop=stop,
                                   mesh_step=mesh_step)
    if mesh_step is None:
        assert n_new == base
    else:
        # Mesh rounding only ever KEEPS more slots (it can exceed n —
        # the callers treat >= n_streams as "no shrink").
        assert n_new % mesh_step == 0 and n_new >= base
        assert all(i in free for i in range(n_new, n))
