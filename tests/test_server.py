"""OpenAI-compatible HTTP server (nanovllm_tpu/server.py): completions,
chat completions, SSE streaming, stop strings, error handling, health and
stats — all against a live in-process server on a tiny random model."""

import http.client
import json
import threading

import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    from nanovllm_tpu import Config
    from nanovllm_tpu.engine.llm_engine import LLMEngine
    from nanovllm_tpu.models.qwen3 import Qwen3Config, init_params
    from nanovllm_tpu.server import make_server
    from nanovllm_tpu.utils.loader import save_qwen3_weights_hf

    d = tmp_path_factory.mktemp("server_model")
    cfg_dict = dict(
        model_type="qwen3", vocab_size=256, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=512,
        tie_word_embeddings=False,
    )
    with open(d / "config.json", "w") as f:
        json.dump(cfg_dict, f)
    mc = Qwen3Config.from_hf(cfg_dict)
    save_qwen3_weights_hf(init_params(mc, jax.random.PRNGKey(42), jnp.float32),
                          mc, str(d))
    engine = LLMEngine(Config(
        model_path=str(d), dtype="float32", kvcache_block_size=16,
        num_kvcache_blocks=64, max_num_seqs=8, max_model_len=256,
        decode_window=4,
    ))
    server, worker = make_server(engine, host="127.0.0.1", port=0,
                                 model_id="tiny-test")
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield server.server_address
    server.shutdown()
    worker.shutdown()
    server.server_close()


def _request(addr, method, path, body=None):
    conn = http.client.HTTPConnection(*addr, timeout=300)
    conn.request(method, path,
                 body=json.dumps(body) if body is not None else None,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


def test_models_and_health(served):
    code, data = _request(served, "GET", "/v1/models")
    assert code == 200
    models = json.loads(data)
    assert models["data"][0]["id"] == "tiny-test"
    code, data = _request(served, "GET", "/health")
    assert code == 200 and json.loads(data)["healthy"]


def test_completions(served):
    code, data = _request(served, "POST", "/v1/completions", {
        "prompt": "hello world", "max_tokens": 6, "temperature": 0.0,
        "ignore_eos": True,
    })
    assert code == 200, data
    out = json.loads(data)
    assert out["object"] == "text_completion"
    assert out["choices"][0]["finish_reason"] == "length"
    assert isinstance(out["choices"][0]["text"], str)
    assert out["usage"]["completion_tokens"] == 6
    assert out["usage"]["prompt_tokens"] == len(b"hello world")


def test_completions_deterministic_with_seed(served):
    body = {"prompt": "abc", "max_tokens": 5, "temperature": 0.8,
            "seed": 7, "ignore_eos": True}
    outs = [json.loads(_request(served, "POST", "/v1/completions", body)[1])
            ["choices"][0]["text"] for _ in range(2)]
    assert outs[0] == outs[1]


def test_chat_completions(served):
    code, data = _request(served, "POST", "/v1/chat/completions", {
        "messages": [{"role": "system", "content": "be brief"},
                     {"role": "user", "content": "hi"}],
        "max_tokens": 4, "temperature": 0.0, "ignore_eos": True,
    })
    assert code == 200, data
    out = json.loads(data)
    assert out["object"] == "chat.completion"
    msg = out["choices"][0]["message"]
    assert msg["role"] == "assistant" and isinstance(msg["content"], str)


def test_streaming_sse(served):
    conn = http.client.HTTPConnection(*served, timeout=300)
    conn.request("POST", "/v1/completions", body=json.dumps({
        "prompt": "stream me", "max_tokens": 5, "temperature": 0.0,
        "stream": True, "ignore_eos": True,
    }), headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200
    assert resp.getheader("Content-Type") == "text/event-stream"
    raw = resp.read().decode()
    conn.close()
    events = [ln[len("data: "):] for ln in raw.splitlines()
              if ln.startswith("data: ")]
    assert events[-1] == "[DONE]"
    payloads = [json.loads(e) for e in events[:-1]]
    # finish_reason arrives on the last payload; deltas on the others.
    assert payloads[-1]["choices"][0]["finish_reason"] == "length"
    text = "".join(p["choices"][0]["text"] for p in payloads)
    assert isinstance(text, str)


def test_completions_logprobs(served):
    """OpenAI completions semantics: integer `logprobs` = top-N; the
    response carries per-token logprobs (code review r3 — previously
    misparsed and never returned)."""
    code, data = _request(served, "POST", "/v1/completions", {
        "prompt": "lp check", "max_tokens": 3, "temperature": 0.0,
        "logprobs": 2, "ignore_eos": True,
    })
    assert code == 200, data
    lp = json.loads(data)["choices"][0]["logprobs"]
    assert len(lp["token_logprobs"]) == 3
    assert all(isinstance(v, float) and v <= 0.0 for v in lp["token_logprobs"])
    assert all(t and len(t) == 2 for t in lp["top_logprobs"])
    # top_logprobs keys are decoded token TEXT (OpenAI format), not id
    # strings — the byte tokenizer decodes every id to exactly one char.
    assert all(len(k) == 1 for t in lp["top_logprobs"] for k in t)

    code, data = _request(served, "POST", "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 2, "temperature": 0.0, "logprobs": True,
        "top_logprobs": 1, "ignore_eos": True,
    })
    assert code == 200, data
    content = json.loads(data)["choices"][0]["logprobs"]["content"]
    assert len(content) == 2 and "logprob" in content[0]
    assert len(content[0]["top_logprobs"]) == 1


def test_n_choices(served):
    """OpenAI `n`: n independent samples of the prompt in one engine batch;
    indices 0..n-1, aggregated usage, distinct completions (per-choice
    derived seeds when a seed is given)."""
    code, data = _request(served, "POST", "/v1/completions", {
        "prompt": "multi", "max_tokens": 4, "temperature": 1.0, "n": 2,
        "seed": 7, "ignore_eos": True,
    })
    assert code == 200, data
    resp = json.loads(data)
    ch = resp["choices"]
    assert [c["index"] for c in ch] == [0, 1]
    assert ch[0]["text"] != ch[1]["text"]
    assert resp["usage"]["completion_tokens"] == 8

    # Streamed: chunks carry per-choice indices; stream ends with [DONE].
    conn = http.client.HTTPConnection(*served, timeout=300)
    conn.request("POST", "/v1/completions", body=json.dumps({
        "prompt": "multi stream", "max_tokens": 3, "temperature": 1.0,
        "n": 2, "stream": True, "ignore_eos": True,
    }), headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200
    raw = resp.read().decode()
    conn.close()
    events = [ln[len("data: "):] for ln in raw.splitlines()
              if ln.startswith("data: ")]
    assert events[-1] == "[DONE]"
    seen = {json.loads(e)["choices"][0]["index"] for e in events[:-1]}
    assert seen == {0, 1}

    code, data = _request(served, "POST", "/v1/completions", {
        "prompt": "x", "n": 99,
    })
    assert code == 400
    code, data = _request(served, "POST", "/v1/completions", {
        "prompt": "x", "n": 1, "best_of": 3,
    })
    assert code == 400


def test_logit_bias_and_stop_token_ids(served):
    """OpenAI logit_bias (+100 forces a token, string keys) and vLLM-style
    stop_token_ids through the HTTP API."""
    code, data = _request(served, "POST", "/v1/completions", {
        "prompt": "bias", "max_tokens": 4, "temperature": 0.0,
        "logit_bias": {"42": 100}, "ignore_eos": True,
    })
    assert code == 200, data
    resp = json.loads(data)
    assert resp["choices"][0]["text"] == "****"  # chr(42) x 4

    code, data = _request(served, "POST", "/v1/completions", {
        "prompt": "bias", "max_tokens": 4, "temperature": 0.0,
        "logit_bias": {"42": 100}, "stop_token_ids": [42],
        "ignore_eos": True,
    })
    assert code == 200, data
    resp = json.loads(data)
    assert resp["usage"]["completion_tokens"] == 1
    assert resp["choices"][0]["finish_reason"] == "stop"


def test_bad_requests(served):
    code, data = _request(served, "POST", "/v1/completions", {
        "prompt": "x", "temperature": -2.0,
    })
    assert code == 400 and "error" in json.loads(data)
    code, _ = _request(served, "POST", "/v1/chat/completions", {"messages": []})
    assert code == 400
    code, _ = _request(served, "GET", "/nope")
    assert code == 404


def test_stats_and_concurrency(served):
    import concurrent.futures as cf

    def one(i):
        return _request(served, "POST", "/v1/completions", {
            "prompt": f"req {i}", "max_tokens": 4, "temperature": 0.0,
            "ignore_eos": True,
        })[0]

    with cf.ThreadPoolExecutor(4) as ex:
        codes = list(ex.map(one, range(4)))
    assert codes == [200] * 4
    code, data = _request(served, "GET", "/stats")
    assert code == 200
    st = json.loads(data)
    assert st["finished"] >= 4 and st["running"] == 0
