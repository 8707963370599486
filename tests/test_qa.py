"""QA stack tests: tiny flax Llama (causality, cache-consistency, LoRA),
soft-prompt injection vs a per-row numpy reference, code mapping, prompt
packing/label masking, answer parsing, and a short LoRA finetune step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medtok_tpu.qa.llama import TINY_LLAMA, LlamaModel, generate
from medtok_tpu.qa.prompting import accuracy, pack_example, parse_answer
from medtok_tpu.qa.softprompt import MedTokSoftPrompt


@pytest.fixture(scope="module")
def tiny_llm():
    model = LlamaModel(TINY_LLAMA)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 512, (2, 12)), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids)["params"]
    return model, params


def test_causality(tiny_llm):
    model, params = tiny_llm
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 512, (1, 10)), jnp.int32)
    logits, _ = model.apply({"params": params}, ids)
    ids2 = ids.at[0, -1].set((ids[0, -1] + 1) % 512)
    logits2, _ = model.apply({"params": params}, ids2)
    # changing the last token must not affect earlier logits
    np.testing.assert_allclose(
        np.asarray(logits[0, :-1]), np.asarray(logits2[0, :-1]), rtol=1e-5, atol=1e-5
    )
    assert not np.allclose(np.asarray(logits[0, -1]), np.asarray(logits2[0, -1]))


def test_kv_cache_matches_full_forward(tiny_llm):
    model, params = tiny_llm
    cfg = model.cfg
    rng = np.random.default_rng(2)
    B, L = 1, 8
    ids = jnp.asarray(rng.integers(0, 512, (B, L)), jnp.int32)
    full_logits, _ = model.apply({"params": params}, ids)

    Dh = cfg.hidden_size // cfg.num_heads
    total = L
    caches = [
        (jnp.zeros((B, total, cfg.num_kv_heads, Dh)),
         jnp.zeros((B, total, cfg.num_kv_heads, Dh)))
        for _ in range(cfg.num_layers)
    ]
    # feed token by token through the cache
    outs = []
    mask = jnp.zeros((B, total), jnp.int32)
    for t in range(L):
        mask = mask.at[:, t].set(1)
        emb = model.apply({"params": params}, ids[:, t:t+1], method=LlamaModel.embed)
        logits, caches = model.apply(
            {"params": params}, inputs_embeds=emb, attention_mask=mask,
            positions=jnp.full((B, 1), t), caches=caches, cache_pos=t,
        )
        outs.append(logits[:, 0])
    step_logits = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(full_logits), np.asarray(step_logits), rtol=2e-3, atol=2e-3
    )


def test_lora_params_and_freeze():
    import dataclasses

    cfg = dataclasses.replace(TINY_LLAMA, lora_rank=4)
    model = LlamaModel(cfg)
    ids = jnp.zeros((1, 4), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids)["params"]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    lora_keys = [p for p, _ in flat if any(
        getattr(k, "key", "") in ("lora_a", "lora_b") for k in p
    )]
    assert len(lora_keys) == 2 * 2 * cfg.num_layers  # a+b for q,v per layer
    # lora_b starts at zero -> output equals base model
    base = LlamaModel(TINY_LLAMA)
    base_params = base.init({"params": jax.random.PRNGKey(0)}, ids)["params"]

    def strip(t):
        if isinstance(t, dict):
            return {k: strip(v) for k, v in t.items() if k not in ("lora_a", "lora_b")}
        return t

    l1, _ = model.apply({"params": params}, ids)
    # merged base weights equal -> same logits (init keys identical)
    l2, _ = base.apply({"params": base_params}, ids)
    # base initializers see different rng tapes, so just check lora-zero
    # property directly: perturbing lora_a changes nothing while b==0
    import copy

    p2 = copy.deepcopy(jax.device_get(params))
    p2["layers_0"]["self_attn"]["q_proj"]["lora_a"] += 1.0
    l3, _ = model.apply({"params": p2}, ids)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l3), rtol=1e-6)


def test_generate_shapes(tiny_llm):
    model, params = tiny_llm
    B, L, H = 2, 6, model.cfg.hidden_size
    rng = np.random.default_rng(3)
    embeds = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32))
    mask = jnp.ones((B, L), jnp.int32)
    out = generate(model, params, embeds, mask, max_new_tokens=5,
                   temperature=0.0)
    assert out.shape == (2, 5)
    assert out.dtype.kind == "i"


def test_generate_scan_matches_streaming_path(tiny_llm):
    """The fused lax.scan decode and the per-step streaming decode share the
    sampling math and rng split sequence — token-identical outputs."""
    model, params = tiny_llm
    B, L, H = 2, 6, model.cfg.hidden_size
    rng = np.random.default_rng(4)
    embeds = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32))
    mask = jnp.ones((B, L), jnp.int32)
    for temp in (0.0, 0.7):
        key = jax.random.PRNGKey(11)
        fused = generate(model, params, embeds, mask, max_new_tokens=6,
                         temperature=temp, rng=key)
        stream = generate(model, params, embeds, mask, max_new_tokens=6,
                          temperature=temp, rng=key, on_token=lambda t: None)
        np.testing.assert_array_equal(fused, stream)


def test_generate_eos_early_exit_matches_streaming(tiny_llm):
    """With an eos token the fused path is a while_loop that stops once all
    rows finished; its prefix must match the streaming path's (shorter)
    output, with eos fill after."""
    model, params = tiny_llm
    B, L, H = 2, 5, model.cfg.hidden_size
    rng = np.random.default_rng(7)
    embeds = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32))
    mask = jnp.ones((B, L), jnp.int32)
    # learn which token every row would emit first, use it as "eos" so both
    # rows finish on step 1
    probe = generate(model, params, embeds, mask, max_new_tokens=1,
                     temperature=0.0)
    eos = int(probe[0, 0])
    fused = generate(model, params, embeds, mask, max_new_tokens=6,
                     temperature=0.0, eos_token_id=eos)
    stream = generate(model, params, embeds, mask, max_new_tokens=6,
                      temperature=0.0, eos_token_id=eos,
                      on_token=lambda t: None)
    assert fused.shape == (B, 6)
    S = stream.shape[1]
    np.testing.assert_array_equal(fused[:, :S], stream)
    # everything after the streaming cut is eos fill
    assert (fused[:, S:] == eos).all()
    # row 0 finished at its first token
    assert fused[0, 0] == eos or (fused[0] == eos).any()


def test_soft_prompt_injection_matches_reference_semantics():
    """Vectorized injection == the reference's per-row loop (review.py:50-74)."""
    rng = np.random.default_rng(4)
    vocab, H, cl, Lt, total = 50, 16, 8, 6, 24
    table = rng.normal(size=(vocab, 256)).astype(np.float32)
    embed_table = rng.normal(size=(100, H)).astype(np.float32)

    B = 3
    input_ids = np.zeros((B, cl + Lt), np.int64)
    attn = np.zeros((B, cl + Lt), np.int64)
    labels = np.full((B, Lt), -100, np.int64)
    for i in range(B):
        n_med = rng.integers(1, cl)
        input_ids[i, :n_med] = rng.integers(0, vocab, n_med)
        attn[i, :n_med] = 1
        n_text = rng.integers(2, Lt + 1)
        input_ids[i, cl:cl + n_text] = rng.integers(1, 100, n_text)
        attn[i, cl:cl + n_text] = 1
        labels[i, :n_text] = input_ids[i, cl:cl + n_text]

    sp = MedTokSoftPrompt(embeddings=table, hidden_size=H, cutoff_len=cl)
    params = sp.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(input_ids), jnp.asarray(attn), jnp.asarray(labels),
        lambda ids: jnp.asarray(embed_table)[ids], total,
    )
    out = sp.apply(
        params,
        jnp.asarray(input_ids), jnp.asarray(attn), jnp.asarray(labels),
        lambda ids: jnp.asarray(embed_table)[ids], total,
    )
    W = np.asarray(params["params"]["projector"]["kernel"])
    bproj = np.asarray(params["params"]["projector"]["bias"])

    for i in range(B):
        med = input_ids[i, :cl][attn[i, :cl] == 1]
        m = table[med]
        m = m / np.maximum(np.linalg.norm(m, axis=-1, keepdims=True), 1e-12)
        pooled = m.mean(axis=0)
        prefix = pooled @ W + bproj
        text = input_ids[i, cl:][attn[i, cl:] == 1]
        seq = np.concatenate([prefix[None], embed_table[text]], axis=0)
        got = np.asarray(out.inputs_embeds[i])
        np.testing.assert_allclose(got[-len(seq):], seq, rtol=1e-4, atol=1e-5)
        assert np.asarray(out.attention_mask[i]).sum() == len(seq)
        np.testing.assert_array_equal(
            np.asarray(out.labels[i, -len(text):]), labels[i, :len(text)]
        )
        assert np.all(np.asarray(out.labels[i, :-len(text)]) == -100)


def test_pack_example_label_masking():
    row = pack_example([5, 6, 7], [9], [1, 2], cutoff_len=8, eos_token_id=None)
    assert row["input_ids"][:8] == [1, 2, 0, 0, 0, 0, 0, 0]
    assert row["attention_mask"][:8] == [1, 1, 0, 0, 0, 0, 0, 0]
    assert row["input_ids"][8:] == [5, 6, 7, 9]
    assert row["labels"] == [-100, -100, -100, 9]


def test_parse_answer():
    assert parse_answer("The correct answer is B", "B") == "B"
    # label-in-response wins first (reference rule, MedTok_QA_inference.py:181)
    assert parse_answer("xAnswer: C more text", "A") == "A"
    assert parse_answer("xAnswer: C more text", "D") == "C"
    assert parse_answer("A", "D") == "A"
    assert parse_answer("blah B blah", "B") == "B"
    assert parse_answer("", "A") == "None"
    assert accuracy(["A", "B"], ["A", "C"]) == 0.5


def test_lora_finetune_step_updates_only_lora():
    from medtok_tpu.qa.finetune import QAFinetuneConfig, QAFinetuner

    rng = np.random.default_rng(5)
    table = rng.normal(size=(50, 256)).astype(np.float32)
    cfg = QAFinetuneConfig(lora_rank=2, cutoff_len=8, total_len=24,
                           batch_size=2, epochs=1)
    ft = QAFinetuner(TINY_LLAMA, table, cfg)
    params = ft.init_params(None)
    rows = [
        pack_example([5, 6, 7], [9], [1, 2], cutoff_len=8)
        for _ in range(4)
    ]
    before = jax.device_get(params)
    params2 = ft.fit(params, rows)
    after = jax.device_get(params2)
    # base weights frozen; lora_a/b + projector moved
    base_delta = np.abs(
        np.asarray(after["llm"]["layers_0"]["self_attn"]["q_proj"]["base"]["kernel"])
        - np.asarray(before["llm"]["layers_0"]["self_attn"]["q_proj"]["base"]["kernel"])
    ).max()
    lora_delta = np.abs(
        np.asarray(after["llm"]["layers_0"]["self_attn"]["q_proj"]["lora_a"])
        - np.asarray(before["llm"]["layers_0"]["self_attn"]["q_proj"]["lora_a"])
    ).max()
    proj_delta = np.abs(
        np.asarray(after["soft_prompt"]["projector"]["kernel"])
        - np.asarray(before["soft_prompt"]["projector"]["kernel"])
    ).max()
    assert base_delta == 0.0
    assert lora_delta > 0.0
    assert proj_delta > 0.0


def test_query_code_mapper(tmp_path):
    import pandas as pd

    from medtok_tpu.ehr.tasks import CodeMapper
    from medtok_tpu.qa.mapping import QueryCodeMapper

    pd.DataFrame({
        "med_code": ["E11.9", "J01XA01", "A00-B99"],
        "pkg_index_list": [[1], [2], [3]],
    }).to_parquet(tmp_path / "v.parquet")
    qm = QueryCodeMapper(CodeMapper(tmp_path / "v.parquet"))
    assert qm.map_code_dict({"ICD-10": ["E11.9"]}) == [0]
    assert qm.map_code_dict({"ATC": ["J01XA01"]}) == [1]
    assert qm.map_code_dict({"ICD-10": ["A50"]}) == [2]  # range fallback
    assert qm.map_code_dict({}) == [3]  # null sentinel == len(vocab)
    assert qm.map_code_dict({"ICD-9": ["ZZZ999"]}) == [3]
    rows = qm.build_dataset([("q?", "A")], [{"ICD-10": ["E119"]}])
    assert rows[0] == {"input": ["q?", "A"], "medical_codes": [0]}


def test_extraction_parsing():
    from medtok_tpu.qa.extract import extract_codes, flatten_codes, parse_extraction

    text = 'blah {"Diseases": {"ICD-10": ["E11.9"]}, "Medications": {"ATC": ["J01XA01"]}} end'
    parsed = parse_extraction(text)
    flat = flatten_codes(parsed)
    assert flat == {"ICD-10": ["E11.9"], "ATC": ["J01XA01"]}

    calls = []
    def flaky_client(prompt):
        calls.append(prompt)
        return "garbage" if len(calls) == 1 else text
    out = extract_codes("q", flaky_client)
    assert out == flat and len(calls) == 2
    assert extract_codes("q", lambda p: "never json") == {}


def test_qa_inference_end_to_end():
    """Tiny-LLM generation through the full evaluate_qa path."""
    from medtok_tpu.qa.finetune import QAFinetuneConfig, QAFinetuner
    from medtok_tpu.qa.inference import evaluate_qa, extend_with_miss_rows

    rng = np.random.default_rng(7)
    table = extend_with_miss_rows(
        rng.normal(size=(50, 256)).astype(np.float32), num_miss_rows=5
    )
    assert table.shape[0] == 55
    cfg = QAFinetuneConfig(lora_rank=2, cutoff_len=8, total_len=24, batch_size=2)
    ft = QAFinetuner(TINY_LLAMA, table, cfg)
    params = ft.init_params(None)
    rows = [pack_example([5, 6, 7], [], [1, 2], cutoff_len=8) for _ in range(3)]
    acc, preds = evaluate_qa(
        ft, params, rows, ["A", "B", "C"],
        decode_fn=lambda ids: "Answer: A",
        max_new_tokens=3, temperature=0.0, batch_size=2,
    )
    assert preds == ["A", "A", "A"]
    assert acc == pytest.approx(1 / 3)


def test_load_qa_rows_reference_artifacts():
    """The two shipped QA datasets must load and pack through our pipeline."""
    import os

    from medtok_tpu.qa.datasets import load_qa_rows

    path = "/root/reference/Dataset/MedicalQA/medmcqa_dataset.json"
    if not os.path.exists(path):
        pytest.skip("reference dataset not mounted")
    rows = load_qa_rows(path)
    assert len(rows) == 4183
    q, a = rows[0]["input"][:2]
    assert a in "ABCD"
    assert all(isinstance(c, int) for c in rows[0]["medical_codes"])
    packed = pack_example([1, 2, 3], [7], rows[0]["medical_codes"], cutoff_len=256)
    assert len(packed["input_ids"]) == 256 + 4


def test_afrimed_loader_from_records(tmp_path):
    from medtok_tpu.qa.datasets import AfrimedLoader, format_mcq

    records = [
        {"tier": "expert", "question_type": "mcq",
         "question_clean": "What is X?",
         "answer_options": '{"o1": "a", "o2": "b", "o3": "c"}',
         "correct_answer": "option2"},
        {"tier": "novice", "question_type": "mcq",
         "question_clean": "skip me",
         "answer_options": '{"o1": "a"}', "correct_answer": "option1"},
        {"tier": "expert", "question_type": "saq",
         "question_clean": "Explain Y.",
         "answer_rationale": "Because\nreasons."},
    ]
    mcq = AfrimedLoader("AfrimedQA-MCQ", records=records, cache_dir=tmp_path)
    assert len(mcq) == 1
    item = mcq[0]
    assert item["answer"] == "B" and item["answer_index"] == 1
    assert item["text"] == format_mcq("What is X?", ["a", "b", "c"])
    # cache round-trip (no records needed second time)
    mcq2 = AfrimedLoader("AfrimedQA-MCQ", cache_dir=tmp_path)
    assert mcq2[0] == item
    saq = AfrimedLoader("AfrimedQA-SAQ", records=records, cache_dir=tmp_path)
    assert saq[0]["answer"] == "Because reasons."
    with pytest.raises(KeyError):
        AfrimedLoader("nope", records=records)
    with pytest.raises(FileNotFoundError):
        AfrimedLoader("AfrimedQA-MCQ")


def test_stream_generate(tiny_llm):
    from medtok_tpu.qa.callbacks import stream_generate

    model, params = tiny_llm
    rng = np.random.default_rng(9)
    embeds = jnp.asarray(rng.normal(size=(1, 4, model.cfg.hidden_size)).astype(np.float32))
    mask = jnp.ones((1, 4), jnp.int32)
    toks = list(stream_generate(
        generate, model, params, embeds, mask,
        max_new_tokens=4, temperature=0.0,
    ))
    assert len(toks) == 4
    # streamed tokens equal the non-streamed run
    ref = generate(model, params, embeds, mask, max_new_tokens=4, temperature=0.0)
    assert toks == ref[0].tolist()


def test_tp_sharded_finetune_matches_single_device():
    """(dp=2, tp=4) mesh over 8 virtual devices: the frozen-base TP layout
    (qa.sharding, Megatron column/row-parallel) must reproduce the
    single-device finetune step — same loss, same updated LoRA params
    (VERDICT missing #5)."""
    from medtok_tpu.qa.finetune import QAFinetuneConfig, QAFinetuner

    rng = np.random.default_rng(6)
    table = rng.normal(size=(50, 256)).astype(np.float32)
    rows = [
        pack_example([5 + i, 6, 7], [9 + i], [1, 2 + i], cutoff_len=8)
        for i in range(4)
    ]
    losses, trees = [], []
    for dp, tp in ((1, 1), (2, 4)):
        cfg = QAFinetuneConfig(lora_rank=2, cutoff_len=8, total_len=24,
                               batch_size=4, epochs=1, mesh_dp=dp, mesh_tp=tp)
        ft = QAFinetuner(TINY_LLAMA, table, cfg)
        params = ft.init_params(None)
        if tp > 1:
            # every large llm kernel must actually be sharded over tp
            from medtok_tpu.parallel.mesh import TP_AXIS

            k = params["llm"]["layers_0"]["self_attn"]["q_proj"]["base"]["kernel"]
            assert TP_AXIS in k.sharding.spec
            d = params["llm"]["layers_0"]["mlp"]["down_proj"]["kernel"]
            assert TP_AXIS in d.sharding.spec
        log = []
        params = ft.fit(params, rows, log_fn=lambda s, l: log.append(l))
        losses.append(log)
        trees.append(jax.device_get(params))
    assert losses[0] == pytest.approx(losses[1], rel=1e-4)
    a = trees[0]["llm"]["layers_0"]["self_attn"]["q_proj"]["lora_b"]
    b = trees[1]["llm"]["layers_0"]["self_attn"]["q_proj"]["lora_b"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                               atol=1e-6)
