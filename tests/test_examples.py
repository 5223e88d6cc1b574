"""Smoke tests for the example drivers (the reference's CTest style:
run each driver on the built-in small parameters and check key printed
values - examples/CMakeLists.txt:59-120)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMALL = ["--refinements", "1", "--batch", "8", "--samples", "8", "--mse", "0.05"]
TINY_MESH = []  # default 4^3 box


def test_darcy_test_golden(capsys):
    from examples import darcy_test

    darcy_test.main(["--refinements", "2"])
    out = capsys.readouterr().out
    # Golden dof table (reference examples/CMakeLists.txt:62-66).
    assert "17152" in out and "2240" in out and "304" in out
    # k=1 effective permeability = 2 on every level.
    for line in out.splitlines():
        if line.strip() and line.split()[0] in ("0", "1", "2"):
            q = float(line.split()[-1])
            np.testing.assert_allclose(q, 2.0, rtol=1e-5)


def test_darcy_random_input(capsys):
    from examples import darcy_random_input

    darcy_random_input.main(SMALL)
    out = capsys.readouterr().out
    assert "Q" in out


def test_mlmc_driver(capsys, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from examples import mlmc

    est = mlmc.main(SMALL)
    out = capsys.readouterr().out
    assert "FINAL MLMC ERRORS" in out
    assert 1.0 < est < 5.0


def test_slmc_driver(capsys, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from examples import slmc

    est = slmc.main(SMALL)
    assert "FINAL SLMC ERRORS" in capsys.readouterr().out


def test_mlmc_manual(capsys):
    from examples import mlmc_manual

    est = mlmc_manual.main(SMALL)
    assert 1.0 < est < 5.0


def test_likelihood_example(capsys, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from examples import likelihood_example

    likelihood_example.main(SMALL)
    out = capsys.readouterr().out
    assert "L = 0 :" in out and "L = 1 :" in out
    # Likelihood values in (0, 1].
    for line in out.splitlines():
        if line.startswith("L = "):
            v = float(line.split(":")[1])
            assert 0.0 < v <= 1.0


def test_ratio_estimator_mlmc(capsys, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from examples import ratio_estimator_mlmc

    est = ratio_estimator_mlmc.main(SMALL + ["--splitting"])
    assert "Splitting Estimate" in capsys.readouterr().out


def test_realization_test(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    from examples import realization_test

    realization_test.main(["--refinements", "1"])
    assert (tmp_path / "realization_L00.vtk").exists()
    assert (tmp_path / "realization_mesh_L00.mesh").exists()
    vtk = (tmp_path / "realization_L00.vtk").read_text()
    assert "RECTILINEAR_GRID" in vtk and "CELL_DATA" in vtk


def test_sampler_performance(capsys):
    from examples import sampler_performance

    sampler_performance.main(["--refinements", "1", "--batch", "8"])
    out = capsys.readouterr().out
    assert "samples/sec" in out


def test_spe10_mlmc_synthetic(capsys, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from examples import spe10_mlmc

    # Tiny scaled-down SPE10 run with synthetic permeability.
    spe10_mlmc.main(
        ["--grid", "8,12,4", "--refinements", "1", "--samples", "4",
         "--batch", "4", "--mse", "1e10"]
    )
    out = capsys.readouterr().out
    assert "Estimate" in out


def test_sampler_test_driver(capsys):
    from examples import sampler_test

    sampler_test.main(
        ["--refinements", "1", "--batch", "16", "--samples", "8", "--corlen", "0.4"]
    )
    out = capsys.readouterr().out
    assert "SPDE-projection" in out


def test_mlmc_driver_on_mesh_files(capsys, tmp_path, monkeypatch):
    # Reference mesh files drive the same MLMC example: structured
    # (cube_hex.mesh) and unstructured (cube_tet.mesh).
    monkeypatch.chdir(tmp_path)
    from examples import mlmc

    for mesh in ("/root/reference/meshes/cube_hex.mesh",
                 "/root/reference/meshes/cube_tet.mesh"):
        est = mlmc.main(
            ["--mesh", mesh, "--refinements", "1", "--batch", "8",
             "--samples", "8", "--mse", "1e10", "--variance", "0.25"]
        )
        out = capsys.readouterr().out
        assert "FINAL MLMC ERRORS" in out
        assert np.isfinite(est)
