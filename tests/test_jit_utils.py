import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parelagmc_tpu.ops.jit_utils import jit_hoisted


def test_values_match_plain_jit():
    big = jnp.asarray(np.random.default_rng(0).normal(size=(64, 32)))

    def fn(x, y):
        return (x * big).sum() + y, x + 1.0

    g = jit_hoisted(fn, jnp.float64(2.0), jnp.float64(3.0))
    a, b = g(jnp.float64(2.0), jnp.float64(3.0))
    ra, rb = fn(jnp.float64(2.0), jnp.float64(3.0))
    np.testing.assert_allclose(float(a), float(ra))
    np.testing.assert_allclose(float(b), float(rb))
    # Different argument values reuse the same compiled callable.
    a2, _ = g(jnp.float64(-1.0), jnp.float64(0.5))
    np.testing.assert_allclose(float(a2), float(fn(jnp.float64(-1.0), jnp.float64(0.5))[0]))


def test_constants_hoisted_out_of_module():
    big = jnp.asarray(np.random.default_rng(1).normal(size=(2000, 70)).astype(np.float32))

    def fn(x):
        return (x * big).sum()

    # Plain jit embeds the 560KB constant in the module text; the hoisted
    # version must not (this is what prevented SPE10-scale compiles).
    plain_txt = jax.jit(fn).lower(jnp.float32(1.0)).as_text()
    assert len(plain_txt) > 500_000
    g = jit_hoisted(fn, jnp.float32(1.0))
    assert len(g._consts) == 1
    np.testing.assert_allclose(
        float(g(jnp.float32(1.0))), float(fn(jnp.float32(1.0))), rtol=1e-6
    )


def test_pytree_args_and_outputs():
    w = jnp.arange(8.0)

    def fn(tree):
        return {"s": (tree["a"] * w).sum(), "t": [tree["a"], tree["b"] + 1]}

    ex = {"a": jnp.ones(8), "b": jnp.zeros(3)}
    g = jit_hoisted(fn, ex)
    out = g(ex)
    assert set(out.keys()) == {"s", "t"}
    np.testing.assert_allclose(float(out["s"]), float(w.sum()))
    # Structure mismatch is rejected loudly.
    with pytest.raises(TypeError):
        g({"a": jnp.ones(8)})


def test_aot_compile_does_not_change_results():
    def fn(x):
        return x * 2.0

    g = jit_hoisted(fn, jnp.ones(4))
    g.aot_compile()
    np.testing.assert_allclose(np.asarray(g(jnp.ones(4))), 2.0)
