"""AOT train-step cache (train/aot.py): export → load roundtrip equality,
cache hit/miss/corrupt-fallback orchestration, and key sensitivity.

The artifact must reproduce the jitted step exactly (same StableHLO), keep
the donation contract, and degrade to a normal build on any failure."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecologysemanticsegmentation_tpu.models import build_model
from ecologysemanticsegmentation_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)
from ecologysemanticsegmentation_tpu.train.aot import (
    cached_train_step,
    export_train_step,
    load_train_step,
    train_step_cache_key,
)

IMG, C, B = 32, 3, 2


@pytest.fixture(scope="module")
def setup():
    model = build_model("unet", num_classes=C, encoder_name="resnet34")
    tx = make_optimizer(3e-4)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, IMG, IMG, 3), tx)
    step = make_train_step(model, tx, augment=True)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(B, IMG, IMG, 3), jnp.float32),
        "label": jnp.asarray((rng.rand(B, IMG, IMG, C) > 0.5).astype(np.float32)),
    }
    example = (
        state,
        batch,
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((), jnp.float32),
        jax.ShapeDtypeStruct((3,), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.float32),
        jax.ShapeDtypeStruct((2,), jnp.float32),
    )
    return model, tx, state, step, batch, example


def _call(step, state, batch, seed=7):
    gates3 = jnp.ones((3,), jnp.float32)
    jitters = jnp.ones((2,), jnp.float32)
    return step(
        jax.tree.map(jnp.copy, state), batch, jax.random.PRNGKey(seed),
        0.3, gates3, 3e-4, jitters,
    )


def test_roundtrip_matches_direct(setup, tmp_path):
    _, _, state, step, batch, example = setup
    blob = export_train_step(step, example)
    path = os.path.join(tmp_path, "step.aot")
    with open(path, "wb") as f:
        f.write(blob)
    loaded = load_train_step(path)

    s_d, m_d = _call(step, state, batch)
    s_l, m_l = _call(loaded, state, batch)
    np.testing.assert_allclose(float(m_d["loss"]), float(m_l["loss"]), rtol=1e-6)
    deltas = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))),
        s_d.params, s_l.params,
    )
    assert max(jax.tree.leaves(deltas)) <= 1e-6

    # donation contract: the returned state feeds the next call
    s2, m2 = loaded(s_l, batch, jax.random.PRNGKey(8),
                    0.3, jnp.ones((3,), jnp.float32), 3e-4,
                    jnp.ones((2,), jnp.float32))
    assert np.isfinite(float(m2["loss"]))
    assert int(s2.step) == int(s_d.step) + 1


def test_cache_miss_then_hit(setup, tmp_path):
    _, _, state, step, batch, example = setup
    cfg = {"model": "unet", "img": IMG, "batch": B}
    s1, status1 = cached_train_step(lambda: step, cfg, str(tmp_path), example)
    assert status1 == "miss"
    s2, status2 = cached_train_step(
        lambda: pytest.fail("hit must not rebuild"), cfg, str(tmp_path), example)
    assert status2 == "hit"
    _, m1 = _call(s1, state, batch)
    _, m2 = _call(s2, state, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)


def test_corrupt_artifact_falls_back(setup, tmp_path):
    _, _, state, step, batch, example = setup
    cfg = {"model": "unet", "img": IMG, "batch": B, "v": "corrupt"}
    _, status = cached_train_step(lambda: step, cfg, str(tmp_path), example)
    assert status == "miss"
    (art,) = [p for p in os.listdir(tmp_path) if p.endswith(".aot")]
    with open(os.path.join(tmp_path, art), "wb") as f:
        f.write(b"garbage")
    with pytest.warns(UserWarning, match="AOT cache load failed"):
        s, status = cached_train_step(lambda: step, cfg, str(tmp_path), example)
    assert status == "miss"  # rebuilt + re-exported
    _, m = _call(s, state, batch)
    assert np.isfinite(float(m["loss"]))


def test_key_sensitivity():
    k1 = train_step_cache_key({"model": "unet", "img": 32})
    k2 = train_step_cache_key({"model": "unet", "img": 64})
    k3 = train_step_cache_key({"model": "unet", "img": 32})
    assert k1 != k2 and k1 == k3


def test_key_tracks_trace_env_knobs(monkeypatch):
    """Every env knob read at trace time must be in the key, or flipping it
    is silently ignored on a hit (LOSS_SUMS_USE_PALLAS switches the Pallas
    kernel vs the jnp path; TPU_SCOPED_VMEM_KIB switches compiler options)."""
    cfg = {"model": "unet", "img": 32}
    base = train_step_cache_key(cfg)
    for knob in ("LOSS_SUMS_USE_PALLAS", "TPU_SCOPED_VMEM_KIB",
                 "AUGMENT_PER_SAMPLE", "VGG_REMAT_PREVENT_CSE"):
        monkeypatch.setenv(knob, "1")
        assert train_step_cache_key(cfg) != base, knob
        monkeypatch.delenv(knob)
    assert train_step_cache_key(cfg) == base


def test_first_call_fallback_rebuilds():
    """An artifact that loads but fails at its FIRST call (backend compile
    rejection) must rebuild via the builder instead of crashing; later-call
    failures propagate."""
    from ecologysemanticsegmentation_tpu.train.aot import _with_first_call_fallback

    calls = {"built": 0}

    def bad_loaded(*args):
        raise RuntimeError("backend rejected tpu_custom_call payload")

    def build():
        calls["built"] += 1
        return lambda *args: ("rebuilt", args)

    step = _with_first_call_fallback(bad_loaded, build)
    with pytest.warns(UserWarning, match="failed at first call"):
        out = step(1, 2)
    assert out == ("rebuilt", (1, 2)) and calls["built"] == 1
    assert step(3)[0] == "rebuilt" and calls["built"] == 1  # resolved, no rebuild

    seen = {"n": 0}

    def good_then_bad_loaded(*args):
        seen["n"] += 1
        if seen["n"] > 1:
            raise RuntimeError("late failure")
        return "ok"

    guarded = _with_first_call_fallback(
        good_then_bad_loaded, lambda: pytest.fail("must not rebuild"))
    assert guarded() == "ok"
    with pytest.raises(RuntimeError, match="late failure"):
        guarded()  # later-call failures are real errors, no silent rebuild


def test_in_tree_drift_detected(setup, tmp_path):
    """The flat calling convention checks the argument pytree structure on
    the first call: same leaves under a different structure must raise, not
    silently apply a misassigned program."""
    _, _, state, step, batch, example = setup
    blob = export_train_step(step, example)
    path = os.path.join(tmp_path, "step.aot")
    with open(path, "wb") as f:
        f.write(blob)
    loaded = load_train_step(path)
    gates3 = jnp.ones((3,), jnp.float32)
    jitters = jnp.ones((2,), jnp.float32)
    # batch as a (image, label) TUPLE: identical leaf order/shapes, different
    # treedef — exactly the silent-drift case the check exists for.
    with pytest.raises(ValueError, match="pytree structure"):
        loaded(jax.tree.map(jnp.copy, state), (batch["image"], batch["label"]),
               jax.random.PRNGKey(7), 0.3, gates3, 3e-4, jitters)


def test_loaded_step_compiles_once_across_state_commit_flip(setup, tmp_path):
    """A loaded artifact step must not recompile at its SECOND call.

    create_train_state leaves are (partly) uncommitted; from call 2 on the
    state is the step's own committed output, and jit(exported.call) keys on
    the argument sharding mapping (plain jit of a pytree function does not) —
    without the first-call device_put in load_train_step.step this costs a
    full second backend compile (~44 s through the axon relay, measured in
    experiments/aot_train_ab.jsonl)."""
    _, _, state, step, batch, example = setup
    blob = export_train_step(step, example)
    path = os.path.join(tmp_path, "step.aot")
    with open(path, "wb") as f:
        f.write(blob)
    loaded = load_train_step(path)

    import logging

    compiles = []

    class _H(logging.Handler):
        def emit(self, rec):
            if "Compiling" in rec.getMessage():
                compiles.append(rec.getMessage())

    h = _H()
    logger = logging.getLogger("jax._src.interpreters.pxla")
    logger.addHandler(h)
    state0 = jax.tree.map(jnp.copy, state)  # the fixture state is shared;
    # this step donates (consumes) its input
    try:
        with jax.log_compiles():
            s1, m1 = loaded(state0, batch, jax.random.PRNGKey(7), 0.3,
                            jnp.ones((3,), jnp.float32), 3e-4,
                            jnp.ones((2,), jnp.float32))
            float(m1["loss"])
            n_first = len(compiles)
            s2, m2 = loaded(s1, batch, jax.random.PRNGKey(8), 0.3,
                            jnp.ones((3,), jnp.float32), 3e-4,
                            jnp.ones((2,), jnp.float32))
            float(m2["loss"])
    finally:
        logger.removeHandler(h)
    assert n_first >= 1  # the first call did compile (sanity on the probe)
    assert len(compiles) == n_first, (
        f"second call recompiled: {compiles[n_first:]}")
    assert int(s2.step) == 2
