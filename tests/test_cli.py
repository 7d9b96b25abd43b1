"""CLI option/validator parity tests — the analog of the reference's own
test surface (tests/test_options.R: per-flag default+override matrix,
validator bounds, --data_dir resolution, seed rooting). Pure argparse, no
Spark session needed."""

from __future__ import annotations

import pytest

from taxahfe_spark.cli import load_args

HFE = ["run-hfe", "meta.txt", "data.txt"]
ML = ["run-hfe-ml", "meta.txt", "data.txt"]
DML = ["run-dietml", "data.csv"]


# flag -> (default, override_argv_fragment, override_value), mirroring the
# reference test_flag_values matrix (tests/test_options.R:225+)
HFE_FLAGS = {
    "subject_identifier": ("subject_id", ["-s", "sid"], "sid"),
    "label": ("feature_of_interest", ["-l", "y"], "y"),
    "feature_type": ("factor", ["-t", "numeric"], "numeric"),
    "random_effects": (False, ["-R"], True),
    "k_splits": (3, ["-k", "4"], 4),
    "abundance": (0, ["-a", "0.1"], 0.1),
    "prevalence": (0.01, ["-p", "0.2"], 0.2),
    "lowest_level": (3, ["-L", "2"], 2),
    "max_level": (15, ["-m", "9"], 9),
    "cor_level": (0.95, ["-c", "0.8"], 0.8),
    "disable_super_filter": (False, ["-d"], True),
    "write_old_files": (False, ["-w"], True),
    "write_flattened_tree": (False, ["-W"], True),
    "write_both_outputs": (False, ["-D"], True),
    "nperm": (40, ["--nperm", "10"], 10),
    "ncores": (2, ["-n", "4"], 4),
}

ML_FLAGS = {
    "train_split": (0.8, ["--train_split", "0.7"], 0.7),
    "info_gain_n": (0, ["--info_gain_n", "5"], 5),
    "vif_threshold": (0, ["--vif_threshold", "5"], 5),
    "model": ("rf", ["--model", "ridge"], "ridge"),
    "folds": (10, ["--folds", "5"], 5),
    "cv_repeats": (3, ["--cv_repeats", "2"], 2),
    "metric": ("bal_accuracy", ["--metric", "kap"], "kap"),
    "tune_length": (80, ["--tune_length", "10"], 10),
    "tune_time": (2, ["--tune_time", "1"], 1),
    "tune_stop": (10, ["--tune_stop", "5"], 5),
    "pct_loss": (0, ["--pct_loss", "3"], 3),
    "parallel_workers": (1, ["--parallel_workers", "2"], 2),
    "shap": (False, ["--shap"], True),
    "summarized_levels": (False, ["--summarized_levels"], True),
}


@pytest.mark.parametrize("flag", sorted(HFE_FLAGS))
def test_hfe_flag_defaults_and_overrides(flag):
    default, frag, value = HFE_FLAGS[flag]
    assert getattr(load_args(HFE), flag) == default
    assert getattr(load_args(HFE + frag), flag) == value


@pytest.mark.parametrize("flag", sorted(ML_FLAGS))
def test_ml_flag_defaults_and_overrides(flag):
    default, frag, value = ML_FLAGS[flag]
    assert getattr(load_args(ML), flag) == default
    assert getattr(load_args(ML + frag), flag) == value


@pytest.mark.parametrize(
    "frag",
    [
        ["-c", "1.5"],          # cor_level > 1
        ["-c", "-0.1"],         # cor_level < 0
        ["-p", "1.5"],          # prevalence > 1
        ["-a", "-1"],           # abundance < 0
        ["-L", "0"],            # lowest_level < 1
        ["-m", "1001"],         # max_level > 1000
        ["-k", "1"],            # k_splits < 2
        ["--nperm", "0"],       # nperm < 1
        ["--seed", "4e9"],      # seed outside 32-bit
    ],
)
def test_validator_hard_bounds(frag):
    with pytest.raises(SystemExit):
        load_args(HFE + frag)


@pytest.mark.parametrize(
    "frag",
    [
        ["--folds", "1"],       # folds < 2
        ["--pct_loss", "101"],  # pct_loss > 100
        ["--train_split", "-0.1"],
    ],
)
def test_ml_validator_hard_bounds(frag):
    with pytest.raises(SystemExit):
        load_args(ML + frag)


@pytest.mark.parametrize(
    "frag, pat",
    [
        (["-c", "0.5"], "correlation this low"),
        (["-m", "17"], "hierarchical levels"),
        (["--nperm", "300"], "nperm value is high"),
        (["-L", "1"], "artificial taxonomic root"),
        (["-k", "7"], "lot of splits"),
    ],
)
def test_validator_warnings(frag, pat):
    with pytest.warns(UserWarning, match=pat):
        load_args(HFE + frag)


def test_data_dir_resolution_and_absolute_passthrough():
    o = load_args(HFE + ["--data_dir", "/data"])
    assert o.METADATA == "/data/meta.txt"
    assert o.DATA == "/data/data.txt"
    assert o.output_dir == "/data/outputs"
    o2 = load_args(["run-hfe", "/abs/m.txt", "d.txt", "--data_dir", "/data"])
    assert o2.METADATA == "/abs/m.txt"
    assert o2.DATA == "/data/d.txt"


def test_seed_rooting():
    assert load_args(HFE + ["--seed", "1234"]).seed == 1234
    s = load_args(HFE).seed
    assert isinstance(s, int) and -(2**31) < s < 2**31


def test_model_choices_enforced():
    with pytest.raises(SystemExit):
        load_args(ML + ["--model", "nonsense"])


def test_dietml_parser_has_no_metadata_positional():
    o = load_args(DML + ["--model", "lasso", "-t", "numeric"])
    assert o.DATA.endswith("data.csv")
    assert o.model == "lasso"
    assert not hasattr(o, "METADATA")
