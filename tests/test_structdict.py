import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyhybridcontrol_tpu.utils.structdict import StructDict, named_struct_dict
from pyhybridcontrol_tpu.utils.matrix_utils import (
    atleast_2d_col, block_diag, block_diag_rep, block_toeplitz, matrix_powers)


def test_attribute_access():
    s = StructDict(a=1, b=2)
    assert s.a == 1
    s.c = 3
    assert s["c"] == 3
    del s.a
    with pytest.raises(AttributeError):
        _ = s.a


def test_pytree_roundtrip():
    s = StructDict(a=jnp.ones(3), b=jnp.zeros((2, 2)))
    leaves, treedef = jax.tree_util.tree_flatten(s)
    s2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(s2, StructDict)
    assert set(s2) == {"a", "b"}


def test_structdict_through_jit():
    s = StructDict(a=jnp.ones(3), b=2.0 * jnp.ones(3))

    @jax.jit
    def f(sd):
        return sd.a + sd.b

    np.testing.assert_allclose(f(s), 3.0 * np.ones(3))


def test_named_struct_dict():
    Weights = named_struct_dict("Weights", "Q", "R")
    w = Weights(jnp.eye(2), jnp.eye(1))
    assert w.Q.shape == (2, 2)
    leaves, treedef = jax.tree_util.tree_flatten(w)
    w2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert type(w2).__name__ == "Weights"


def test_update_new_and_sub_struct():
    s = StructDict(a=1, b=2)
    s2 = s.update_new(b=5, c=6)
    assert s.b == 2 and s2.b == 5 and s2.c == 6
    assert set(s2.sub_struct(["a", "c"])) == {"a", "c"}


def test_atleast_2d_col():
    assert atleast_2d_col(3.0).shape == (1, 1)
    assert atleast_2d_col(np.ones(4)).shape == (4, 1)
    assert atleast_2d_col(np.ones((2, 3))).shape == (2, 3)


def test_block_helpers(rng):
    a = rng.normal(size=(2, 3))
    b = rng.normal(size=(1, 2))
    d = block_diag([a, b])
    assert d.shape == (3, 5)
    np.testing.assert_allclose(d[:2, :3], a)
    np.testing.assert_allclose(d[2:, 3:], b)

    r = block_diag_rep(a, 3)
    assert r.shape == (6, 9)
    np.testing.assert_allclose(r[2:4, 3:6], a)
    np.testing.assert_allclose(r[0:2, 3:6], 0)

    blocks = [rng.normal(size=(2, 2)) for _ in range(3)]
    t = block_toeplitz(blocks)
    np.testing.assert_allclose(t[4:6, 0:2], blocks[2])
    np.testing.assert_allclose(t[4:6, 2:4], blocks[1])
    np.testing.assert_allclose(t[0:2, 2:4], 0)

    A = rng.normal(size=(3, 3))
    pw = matrix_powers(A, 3)
    np.testing.assert_allclose(pw[2], A @ A)
    np.testing.assert_allclose(pw[3], A @ A @ A)
