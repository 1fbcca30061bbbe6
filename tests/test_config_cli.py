"""Config surface, stage registry, CLI entry (S5/M16/§2.10 parity)."""

import json
import subprocess
import sys

import pytest

from ner_extractor_ray.config import PipelineConfig, get_stage, registered_stages


def test_defaults_validate():
    cfg = PipelineConfig.load()
    assert cfg.tagger == "deterministic" and cfg.max_seq_length == 192


def test_yaml_and_overrides(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("batch_size: 512\nlsh_threshold: 0.7\n")
    cfg = PipelineConfig.load(str(p), overrides={"n_partitions": 4})
    assert cfg.batch_size == 512 and cfg.lsh_threshold == 0.7 and cfg.n_partitions == 4


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("no_such_key: 1\n")
    with pytest.raises(ValueError, match="unknown config keys"):
        PipelineConfig.load(str(p))


def test_reserved_toggle_fails_fast():
    with pytest.raises(NotImplementedError):
        PipelineConfig(use_char_features=True).validate()


def test_hf_requires_checkpoint():
    with pytest.raises(ValueError, match="hf_checkpoint"):
        PipelineConfig(tagger="hf").validate()


def test_stage_registry():
    names = registered_stages()
    for expected in ("extract", "sentseg", "tokenize", "decode", "relations",
                     "langid", "quality", "token_stats", "fingerprint"):
        assert expected in names
    assert callable(get_stage("extract"))
    with pytest.raises(KeyError):
        get_stage("nope")


def test_cli_gen(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "ner_extractor_ray.cli", "gen",
         "--out", str(tmp_path / "pages"), "--n-pages", "20", "--n-files", "2"],
        capture_output=True, text=True, check=True, cwd="/root/repo",
    )
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["n_pages"] == 20
    assert (tmp_path / "pages" / "gold_triples.parquet").exists()
