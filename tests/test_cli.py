"""Console driver tests (`python -m gpusorting_tpu`).

The reference's L5 entry points are executable drivers running the suites
(GPUSortingD3D12.cpp:118-160, GPUSortingCUDA.cu:16-58); ours is argparse
over the same api surfaces.  Tiny sizes: CPU CI budget.
"""

import json

import pytest

from gpusorting_tpu.__main__ import _parse_size, build_parser, main


def test_parse_size_forms():
    assert _parse_size("2^12") == 4096
    assert _parse_size("4096") == 4096
    assert _parse_size(" 10^3 ") == 1000


def test_parser_requires_command():
    with pytest.raises(SystemExit):
        build_parser().parse_args([])


def test_cli_info(capsys):
    assert main(["info", "--json"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert "device" in out and "tuning" in out
    assert set(out["tuning"]) == {"keys_only", "pairs"}


def test_cli_test_all_small(capsys):
    rc = main(["test", "--window", "1024", "--stride", "509",
               "--large", "2^12"])
    assert rc == 0
    assert "passed" in capsys.readouterr().out


def test_cli_segsort_bits(capsys):
    assert main(["segsort", "--total", "2^12", "--maxlen", "16",
                 "--bits", "8"]) == 0
    assert "PASS" in capsys.readouterr().out


def test_cli_dist(capsys):
    # conftest already provides the 8-virtual-device CPU mesh
    assert main(["dist", "--n", "2^12"]) == 0
    assert "PASS" in capsys.readouterr().out


def test_cli_bench_json_line(capsys):
    assert main(["bench", "--n", "2^12", "--batch", "2"]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["n"] == 4096 and res["keys_per_sec"] > 0
    assert res["algorithm"] == "OneSweep"
