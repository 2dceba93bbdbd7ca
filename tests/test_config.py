"""Config validation, JSON round-trip, and builders
(mirrors reference src/config.rs inline tests)."""

import pytest

from nanovllm_tpu import Config


def make(tmp_model_dir, **kw):
    kw.setdefault("device", "cpu")
    return Config(model_path=tmp_model_dir, **kw)


def test_defaults_validate(tmp_model_dir):
    cfg = make(tmp_model_dir)
    cfg.validate()
    assert cfg.max_num_batched_tokens == 32768
    assert cfg.max_num_seqs == 512
    assert cfg.max_model_len == 4096
    assert cfg.kvcache_block_size == 64


def test_missing_model_path():
    with pytest.raises(ValueError, match="model_path"):
        Config(model_path="/nonexistent/definitely/not/here").validate()
    with pytest.raises(ValueError, match="model_path"):
        Config().validate()


def test_block_size_must_be_multiple_of_16(tmp_model_dir):
    with pytest.raises(ValueError, match="kvcache_block_size"):
        make(tmp_model_dir, kvcache_block_size=25).validate()
    make(tmp_model_dir, kvcache_block_size=16).validate()
    make(tmp_model_dir, kvcache_block_size=256).validate()


def test_tp_and_mem_util_ranges(tmp_model_dir):
    with pytest.raises(ValueError, match="tensor_parallel_size"):
        make(tmp_model_dir, tensor_parallel_size=0).validate()
    with pytest.raises(ValueError, match="memory_utilization"):
        make(tmp_model_dir, memory_utilization=1.5).validate()
    with pytest.raises(ValueError, match="memory_utilization"):
        make(tmp_model_dir, memory_utilization=0.0).validate()


def test_device_dtype_quant_whitelists(tmp_model_dir):
    with pytest.raises(ValueError, match="device"):
        make(tmp_model_dir, device="cuda").validate()
    with pytest.raises(ValueError, match="dtype"):
        make(tmp_model_dir, dtype="fp64").validate()
    with pytest.raises(ValueError, match="quantization"):
        make(tmp_model_dir, quantization="int2").validate()
    make(tmp_model_dir, quantization="int8", kv_cache_dtype="fp8").validate()
    make(tmp_model_dir, kv_cache_dtype="int8").validate()


def test_json_roundtrip(tmp_model_dir, tmp_path):
    cfg = make(tmp_model_dir, max_num_seqs=7, kvcache_block_size=32)
    p = str(tmp_path / "cfg.json")
    cfg.save(p)
    loaded = Config.load(p)
    assert loaded == cfg


def test_builders(tmp_model_dir):
    cfg = (
        Config()
        .with_model_path(tmp_model_dir)
        .with_device("cpu")
        .with_max_num_seqs(16)
        .with_max_model_len(128)
        .with_kvcache_block_size(16)
        .with_tensor_parallel_size(2)
        .with_quantization("int8")
        .with_enable_prefix_caching(False)
    )
    cfg.validate()
    assert cfg.max_num_seqs == 16
    assert not cfg.enable_prefix_caching
    assert cfg.tensor_parallel_size == 2


class TestHubResolution:
    def test_local_dir_passes_through(self, tmp_path):
        from nanovllm_tpu.utils.hub import resolve_model

        assert resolve_model(str(tmp_path)) == str(tmp_path)

    def test_unresolvable_ref_raises_clean_error(self):
        import pytest

        from nanovllm_tpu.utils.hub import resolve_model

        with pytest.raises(ValueError, match="neither a local directory"):
            resolve_model("definitely/not-a-real-model-xyz")
