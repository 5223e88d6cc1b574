import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from parelagmc_tpu.fem import build_mixed_level
from parelagmc_tpu.mesh import make_box_mesh
from parelagmc_tpu.mesh.structured import StructuredMesh
from parelagmc_tpu.ops.tensorsolve import build_tensor_solver, tensor_solve

DT = jnp.float64


def dense_schur(lvl, alpha, ess_mask):
    """Oracle: S = B M^{-1} B^T + alpha W with essential u-dofs eliminated."""
    M = lvl.mass_csr().toarray()
    B = lvl.b_csr().toarray()
    keep = ~ess_mask
    Mk = M[np.ix_(keep, keep)]
    Bk = B[:, keep]
    return Bk @ np.linalg.solve(Mk, Bk.T) + alpha * np.diag(lvl.W)


@pytest.mark.parametrize(
    "ncells,lengths",
    [((4, 3), (1.0, 2.0)), ((3, 3, 2), (1.0, 1.5, 0.5))],
)
def test_tensor_solve_matches_dense_all_ess(ncells, lengths):
    m = make_box_mesh(ncells, lengths=lengths)
    lvl = build_mixed_level(m)
    alpha = 7.0
    nb = 2 * len(ncells)
    ess = lvl.ess_faces(np.ones(nb, dtype=int))
    S = dense_schur(lvl, alpha, ess)
    eig = build_tensor_solver(m, alpha, ess_attr=None, dtype=DT)
    rng = np.random.default_rng(0)
    b = rng.normal(size=(3, lvl.n_s))
    s = np.asarray(tensor_solve(eig, jnp.asarray(b)))
    ref = np.linalg.solve(S, b.T).T
    np.testing.assert_allclose(s, ref, atol=1e-10)


def test_tensor_solve_nonuniform_grid():
    axes = [np.array([0.0, 0.3, 1.0, 1.2]), np.array([0.0, 0.5, 2.0])]
    m = StructuredMesh(axes)
    lvl = build_mixed_level(m)
    alpha = 3.0
    ess = lvl.ess_faces(np.ones(4, dtype=int))
    S = dense_schur(lvl, alpha, ess)
    eig = build_tensor_solver(m, alpha, ess_attr=None, dtype=DT)
    rng = np.random.default_rng(1)
    b = rng.normal(size=(lvl.n_s,))
    s = np.asarray(tensor_solve(eig, jnp.asarray(b)))
    np.testing.assert_allclose(s, np.linalg.solve(S, b), atol=1e-10)


def test_tensor_solve_darcy_bcs():
    # Darcy golden config: sides essential, top/bottom natural, alpha = 0.
    m = make_box_mesh((3, 3, 3), lengths=(2.0, 2.0, 2.0))
    lvl = build_mixed_level(m)
    ess_attr = np.array([0, 1, 1, 1, 1, 0])
    ess = lvl.ess_faces(ess_attr)
    S = dense_schur(lvl, 0.0, ess)
    assert np.linalg.cond(S) < 1e8  # nonsingular thanks to natural faces
    eig = build_tensor_solver(m, 0.0, ess_attr=ess_attr, dtype=DT)
    rng = np.random.default_rng(2)
    b = rng.normal(size=(2, lvl.n_s))
    s = np.asarray(tensor_solve(eig, jnp.asarray(b)))
    np.testing.assert_allclose(s, np.linalg.solve(S, b.T).T, atol=1e-9)


def test_tensor_solve_equals_saddle_solve():
    # Solving the full saddle system and extracting s must equal the Schur
    # solve: [[M, B^T],[B, -alpha W]] [u; s] = [0; b]  =>  s = -S^{-1} b.
    m = make_box_mesh((3, 2), lengths=(1.0, 1.0))
    lvl = build_mixed_level(m)
    alpha = 25.0
    ess = lvl.ess_faces(np.ones(4, dtype=int))
    keep = ~ess
    M = lvl.mass_csr().toarray()[np.ix_(keep, keep)]
    B = lvl.b_csr().toarray()[:, keep]
    nu, ns = M.shape[0], lvl.n_s
    A = np.block([[M, B.T], [B, -alpha * np.diag(lvl.W)]])
    rng = np.random.default_rng(3)
    b = rng.normal(size=ns)
    rhs = np.concatenate([np.zeros(nu), b])
    sol = np.linalg.solve(A, rhs)
    s_saddle = sol[nu:]
    eig = build_tensor_solver(m, alpha, ess_attr=None, dtype=DT)
    s_schur = np.asarray(tensor_solve(eig, jnp.asarray(-b)))
    np.testing.assert_allclose(s_schur, s_saddle, atol=1e-11)
