"""Unit coverage for the AOT executable store (solve/aot.py).

The device round trip is exercised on the chip (bench.py, cop_c5);
these tests pin the host-side contracts: the canonical key must be
call-site- and location-independent but sensitive to real semantic
changes (including baked constants), and store() must fail soft.
"""

import numpy as np
import jax
import jax.numpy as jnp

from dbat_tpu.solve import aot


def _key_of(fn, *args):
    return aot.canonical_key(jax.jit(fn).lower(*args))


def test_key_ignores_callsite_names():
    """The same computation traced through differently named wrappers
    (different source lines and function names in the loc metadata)
    must produce one key."""
    def body(x):
        return jnp.sin(x) @ x

    def wrapper_one(x):
        return body(x)

    def a_totally_different_name_on_another_line(x):
        return body(x)

    x = jnp.ones((8, 8), jnp.float32)
    assert _key_of(wrapper_one, x) == _key_of(
        a_totally_different_name_on_another_line, x)


def test_key_sees_semantic_changes():
    x = jnp.ones((8, 8), jnp.float32)
    k_sin = _key_of(lambda v: jnp.sin(v) @ v, x)
    k_cos = _key_of(lambda v: jnp.cos(v) @ v, x)
    assert k_sin != k_cos


def test_key_sees_baked_constants():
    """A closure-captured numpy constant bakes into the HLO; two
    programs differing only in that data must NOT share a key (the
    round-5 review found the broad base64 pattern also stripped
    hex-printed dense constants)."""
    c1 = np.arange(256, dtype=np.float32)
    c2 = c1.copy()
    c2[17] = -1.0
    x = jnp.ones(256, jnp.float32)
    k1 = _key_of(lambda v: v * jnp.asarray(c1), x)
    k2 = _key_of(lambda v: v * jnp.asarray(c2), x)
    assert k1 != k2


def test_key_strips_mosaic_body_only():
    """The Mosaic-payload pattern must match a backend_config body
    blob and nothing else."""
    blob = "\\22body\\22: \\22" + "A" * 400 + "==\\22"
    assert aot._B64_RE.search(blob)
    hex_constant = "0x" + "AB" * 200
    assert not aot._B64_RE.search(hex_constant)


def test_loc_regex_is_not_greedy_past_parens():
    line = 'func(%arg0: f32 loc("x"), %arg1: f32 loc("y")) -> f32'
    out = aot._LOC_RE.sub("", line)
    assert "%arg1: f32" in out  # greedy .* would have eaten it


def test_store_fails_soft_on_unwritable_dir(tmp_path, monkeypatch):
    """An unwritable store must yield None, not an exception (the
    caller holds a finished compile).  Simulated via mkstemp (the
    suite runs as root, where chmod 0o500 does not bite)."""
    monkeypatch.setenv("DBAT_AOT_DIR", str(tmp_path))

    class FakeCompiled:
        pass

    import tempfile as _tf

    import jax.experimental.serialize_executable as se

    monkeypatch.setattr(se, "serialize",
                        lambda compiled: (b"payload", None, None))

    def raising_mkstemp(*a, **k):
        raise OSError(30, "Read-only file system")

    monkeypatch.setattr(_tf, "mkstemp", raising_mkstemp)
    assert aot.store("deadbeef" * 4, FakeCompiled()) is None


def test_load_miss_returns_none(tmp_path, monkeypatch):
    monkeypatch.setenv("DBAT_AOT_DIR", str(tmp_path))
    assert aot.load("0" * 32) is None


def test_enabled_off_on_cpu(monkeypatch):
    """XLA:CPU serialized executables do not round-trip machine
    features; the store must stay off unless forced."""
    monkeypatch.delenv("DBAT_AOT", raising=False)
    if jax.default_backend() == "cpu":
        assert aot.enabled() is False
    monkeypatch.setenv("DBAT_AOT", "1")
    assert aot.enabled() is True
    monkeypatch.setenv("DBAT_AOT", "0")
    assert aot.enabled() is False
