"""Flash-attention dispatch parity vs the dense XLA path.

On CPU the Pallas TPU kernel runs in interpreter mode only; here we check the
dispatch logic + numerical parity through the interpreter on a small case, and
(when a real TPU is present, which is not the case under the test harness) the
compiled path. The TPU-compiled path is exercised by bench_flash.py.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from graphgps_tpu.ops.mha import mha_core
from graphgps_tpu.ops.pallas import flash_mha


def test_dispatch_small_n_uses_dense(monkeypatch):
    calls = {}
    real = mha_core

    def spy(*a, **k):
        calls["dense"] = True
        return real(*a, **k)

    monkeypatch.setattr("graphgps_tpu.ops.mha.mha_core", spy)
    B, H, N, Dh = 2, 2, 16, 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, N, Dh)).astype(np.float32))
    mask = jnp.ones((B, N), bool)
    flash_mha.mha(q, q, q, mask)
    assert calls.get("dense")


def test_flash_available_policy(monkeypatch):
    monkeypatch.setattr("jax.default_backend", lambda: "tpu")
    assert not flash_mha.flash_available(64, 16)
    assert flash_mha.flash_available(256, 16)
    assert not flash_mha.flash_available(300, 16)  # not lane-aligned
    monkeypatch.setattr("jax.default_backend", lambda: "cpu")
    assert not flash_mha.flash_available(256, 16)  # compiled kernel is TPU-only


def test_dropout_never_takes_flash():
    B, H, N, Dh = 1, 1, 256, 16
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, N, Dh)).astype(np.float32))
    mask = jnp.ones((B, N), bool)
    # with dropout_rate>0 and rng, must not take the flash path (would differ)
    out = flash_mha.mha(q, q, q, mask, dropout_rate=0.5,
                        dropout_rng=jax.random.PRNGKey(0))
    assert out.shape == q.shape
    with pytest.raises(ValueError):
        flash_mha.mha(q, q, q, mask, dropout_rate=0.5,
                      dropout_rng=jax.random.PRNGKey(0), impl="flash")


def test_dispatch_contract_measured_policy(monkeypatch):
    """Documented measured dispatch (round-3 device-clock A/B): auto = dense
    up to N≤GGPS_DENSE_MAX_N within the score-matrix byte budget, chunked
    online-softmax above; flash only on explicit impl='flash'; attn-weight
    capture forces dense (the weights must exist to be captured)."""
    import graphgps_tpu.ops.chunked_mha as cm
    import graphgps_tpu.ops.pallas.flash_mha as fm

    calls = []
    monkeypatch.setattr(fm, "flash_mha",
                        lambda *a, **k: calls.append("flash") or a[0])
    monkeypatch.setattr(fm, "flash_available", lambda n, d: n >= 256)
    real_chunked = cm.chunked_mha
    monkeypatch.setattr(cm, "chunked_mha",
                        lambda *a, **k: calls.append("chunked")
                        or real_chunked(*a, **k))

    import graphgps_tpu.ops.mha as mha_mod
    real_core = mha_mod.mha_core

    def spy_core(*a, **k):
        calls.append("dense")
        return real_core(*a, **k)
    monkeypatch.setattr(mha_mod, "mha_core", spy_core)

    rng = np.random.default_rng(0)
    mk = lambda n, b=1: (jnp.asarray(rng.normal(size=(b, 2, n, 16))
                                     .astype(np.float32)),
                         jnp.ones((b, n), bool))
    q5, m5 = mk(512)
    q10, m10 = mk(1024)
    q20, m20 = mk(2048)

    fm.mha(q5, q5, q5, m5)                            # auto, N≤1024 → dense
    fm.mha(q10, q10, q10, m10)                        # auto, N=1024 → dense
    fm.mha(q20, q20, q20, m20)                        # auto, N>1024 → chunked
    fm.mha(q5, q5, q5, m5, dropout_rate=0.5,
           dropout_rng=jax.random.PRNGKey(0))         # dropout small → dense
    fm.mha(q20, q20, q20, m20, dropout_rate=0.5,
           dropout_rng=jax.random.PRNGKey(0))         # dropout large → chunked
    fm.mha(q5, q5, q5, m5, impl="flash")              # explicit → flash
    fm.mha(q20, q20, q20, m20, impl="dense")          # explicit → dense
    fm.mha(q5, q5, q5, m5, impl="chunked")            # explicit → chunked
    fm.mha(q5, q5, q5, m5, return_attn=True)          # capture → dense
    assert calls == ["dense", "dense", "chunked", "dense", "chunked",
                     "flash", "dense", "chunked", "dense"]
    # byte budget: a huge B·H·N² at N≤1024 still routes to chunked
    monkeypatch.setattr(fm, "_DENSE_MAX_BYTES", 4 * 2 * 512 * 512)
    calls.clear()
    qq, mm = mk(512, b=2)
    fm.mha(qq, qq, qq, mm)
    assert calls == ["chunked"]
