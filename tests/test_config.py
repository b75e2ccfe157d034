"""Config layering parity tests (ref: src/config.rs:376-394, 544-656)."""

import pytest

from amira_rust_asr_server_tpu.config import Config
from amira_rust_asr_server_tpu.errors import ConfigValidationError


def test_defaults():
    cfg = Config.load(search_dir="/nonexistent-dir-xyz", env={})
    assert cfg.server_port == 8057
    assert cfg.max_concurrent_streams == 10
    assert cfg.max_concurrent_batches == 50
    assert cfg.max_symbols_per_step == 30
    assert cfg.max_total_tokens == 200


def test_toml_overrides_defaults(tmp_path):
    (tmp_path / "config.toml").write_text('server_port = 9000\n')
    cfg = Config.load(search_dir=tmp_path, env={})
    assert cfg.server_port == 9000


def test_yaml_overrides_toml(tmp_path):
    (tmp_path / "config.toml").write_text('server_port = 9000\n')
    (tmp_path / "config.yaml").write_text('server_port: 9100\n')
    cfg = Config.load(search_dir=tmp_path, env={})
    assert cfg.server_port == 9100


def test_amira_env_overrides_files(tmp_path):
    (tmp_path / "config.yaml").write_text('server_port: 9100\n')
    cfg = Config.load(search_dir=tmp_path, env={"AMIRA_SERVER_PORT": "9200"})
    assert cfg.server_port == 9200


def test_legacy_env_highest_precedence(tmp_path):
    cfg = Config.load(search_dir=tmp_path, env={
        "AMIRA_SERVER_PORT": "9200",
        "SERVER_PORT": "9300",
        "VOCABULARY_PATH": "/tmp/v.txt",
    })
    assert cfg.server_port == 9300
    assert cfg.vocabulary_path == "/tmp/v.txt"


def test_bool_and_float_coercion(tmp_path):
    cfg = Config.load(search_dir=tmp_path, env={
        "AMIRA_ENABLE_PLATFORM_OPTIMIZATIONS": "false",
        "AMIRA_INFERENCE_TIMEOUT_SECS": "2.5",
    })
    assert cfg.enable_platform_optimizations is False
    assert cfg.inference_timeout_secs == 2.5


@pytest.mark.parametrize("field,value", [
    ("server_port", 0),
    ("server_port", 70000),
    ("inference_timeout_secs", 0.0),
    ("inference_timeout_secs", 1000.0),
    ("max_concurrent_streams", 0),
    ("beam_width", 0),
    ("beam_width", 1000),
    ("decoding_mode", "viterbi"),
    ("inference_backend", "cuda"),
])
def test_validation_rejects(field, value):
    cfg = Config()
    setattr(cfg, field, value)
    with pytest.raises(ConfigValidationError):
        cfg.validate()


def test_path_traversal_rejected():
    cfg = Config(vocabulary_path="../../etc/passwd")
    with pytest.raises(ConfigValidationError):
        cfg.validate()


def test_roundtrip_exports(tmp_path):
    cfg = Config()
    toml_text = cfg.to_toml()
    assert 'server_host = "0.0.0.0"' in toml_text
    yaml_text = cfg.to_yaml()
    assert "server_port: 8057" in yaml_text
