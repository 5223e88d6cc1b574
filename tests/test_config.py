import glob
import os

import pytest

from parelagmc_tpu.config import ProblemConfig, read_xml_parameterlist

XMLDIR = "/root/reference/examples/example_parameterlists"

needs_ref = pytest.mark.skipif(not os.path.isdir(XMLDIR), reason="no reference")


@needs_ref
def test_all_reference_parameterlists_parse():
    files = sorted(glob.glob(f"{XMLDIR}/*.xml"))
    assert len(files) == 5
    for f in files:
        plist = read_xml_parameterlist(f)
        cfg = ProblemConfig.from_parameterlist(plist)
        assert 0 < cfg.correlation_length
        assert plist.sublist("Problem parameters", create=False)


@needs_ref
def test_spe10_parameterlist_values():
    cfg = ProblemConfig.from_parameterlist(
        read_xml_parameterlist(f"{XMLDIR}/spe10_3D_parameters.xml")
    )
    assert cfg.correlation_length == 100.0


@needs_ref
def test_bayes_parameterlist_values():
    cfg = ProblemConfig.from_parameterlist(
        read_xml_parameterlist(f"{XMLDIR}/bayes_square_parameters.xml")
    )
    assert cfg.bayes_noise == 0.09
    assert cfg.bayes_num_obs == 9
    assert len(cfg.bayes_obs_coords) == 18  # 9 points x 2D
    assert cfg.bayes_eps == 0.01


def test_preconditioner_library_sublists_accessible():
    # The reference's full master list includes the Preconditioner Library;
    # our reader must expose nested sublists even though solver selection is
    # by SolverConfig here.
    if not os.path.isdir(XMLDIR):
        pytest.skip("no reference")
    plist = read_xml_parameterlist(f"{XMLDIR}/example_parameters.xml")
    lib = plist.sublist("Preconditioner Library", create=False)
    assert "MINRES-BJ-GS" in lib
    solver = lib.sublist("MINRES-BJ-GS", create=False)
    assert solver.sublist("Solver Parameters", create=False)["Solver name"] == "MINRES"


def test_solver_opt_cli_overrides():
    # --solver-opt sets any DarcySolverConfig field with type coercion
    # (the CLI analog of the reference's preconditioner ParameterList
    # blocks, src/Utilities.cpp solver library).
    from examples.common import parse_config

    cfg = parse_config([
        "--solver-opt", "coefmg_cheby_order=3",
        "--solver-opt", "coefmg_cheby_lo=0.10",
        "--solver-opt", "coefmg_prec_dtype=bfloat16",
        "--solver-opt", "local_schur_scaling=true",
    ])
    assert cfg.darcy_solver.coefmg_cheby_order == 3
    assert cfg.darcy_solver.coefmg_cheby_lo == 0.10
    assert cfg.darcy_solver.coefmg_prec_dtype == "bfloat16"
    assert cfg.darcy_solver.local_schur_scaling is True
    with pytest.raises(SystemExit):
        parse_config(["--solver-opt", "no_such_field=1"])
    with pytest.raises(SystemExit):
        parse_config(["--solver-opt", "coefmg_cheby_order"])  # no '='
