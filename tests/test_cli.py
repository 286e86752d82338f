"""CLI smoke + end-to-end tests, mirroring the reference's test strategy
(its tests/test_commands.py parametrizes --help over every subcommand and
runs each tool end-to-end via Click's CliRunner)."""

from __future__ import annotations

import textwrap

import pytest
from click.testing import CliRunner

from quantms_utils_spark.cli import cli

COMMANDS = [
    "diann2msstats",
    "openms2sample",
    "checksamplesheet",
    "dianncfg",
    "mzmlstats",
    "psmconvert",
]

LEGACY_DESIGN = textwrap.dedent(
    """\
    Fraction_Group\tFraction\tSpectra_Filepath\tLabel\tSample
    1\t1\ta/run_A.mzML\t1\t1
    2\t1\ta/run_B.mzML\t1\t2

    Sample\tMSstats_Condition\tMSstats_BioReplicate
    1\tcontrol\t1
    2\ttreated\t2
    """
)


@pytest.mark.parametrize("command", COMMANDS)
def test_help_exits_zero(command):
    result = CliRunner().invoke(cli, [command, "--help"])
    assert result.exit_code == 0
    assert "Usage" in result.output


def test_group_help_lists_all_commands():
    result = CliRunner().invoke(cli, ["--help"])
    assert result.exit_code == 0
    for command in COMMANDS:
        assert command in result.output


def test_dianncfg_end_to_end(tmp_path):
    result = CliRunner().invoke(
        cli,
        ["dianncfg", "-e", "Trypsin", "-f", "Carbamidomethyl (C)", "--out_dir", str(tmp_path)],
    )
    assert result.exit_code == 0, result.output
    cfg = tmp_path / "diann_config.cfg"
    assert cfg.exists()
    assert "--cut" in cfg.read_text()


def test_dianncfg_unknown_enzyme_exits_nonzero(tmp_path):
    result = CliRunner().invoke(
        cli, ["dianncfg", "-e", "NotAnEnzyme", "--out_dir", str(tmp_path)]
    )
    assert result.exit_code == 1
    assert "Unknown enzyme" in result.output


def test_openms2sample_end_to_end(spark, tmp_path):
    design = tmp_path / "design.tsv"
    design.write_text(LEGACY_DESIGN)
    result = CliRunner().invoke(
        cli,
        ["openms2sample", "--expdesign", str(design), "--out_dir", str(tmp_path),
         "--master", "local[2]"],
    )
    assert result.exit_code == 0, result.output
    assert "rows=" in result.output


def test_mzmlstats_end_to_end(spark, tmp_path):
    result = CliRunner().invoke(
        cli,
        ["mzmlstats", "--ms_path", "runA.mzML", "--parser", "synthetic",
         "--out_dir", str(tmp_path), "--master", "local[2]"],
    )
    assert result.exit_code == 0, result.output
    assert (tmp_path / "runA_ms_info.parquet").exists()
