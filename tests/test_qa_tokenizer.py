"""First-party byte-level BPE tokenizer vs the installed `tokenizers`
library as a parity oracle, plus the Llama-3 chat-template contract
(MedTok_fintune_llama3.py:93-132)."""

import json

import pytest

from medtok_tpu.qa.tokenizer import BPETokenizer, bytes_to_unicode

CORPUS = [
    "The following is a multiple-choice medical question.",
    "Type 2 diabetes mellitus without complications",
    "Patient presents with acute renal failure and hypertension.",
    "What is the first-line therapy? A. insulin B. metformin",
    "Answer: B",
    "naïve café 漢字 mixed-unicode tokens 12345",
    "  leading spaces\nand\nnewlines\t tabs",
]

LLAMA_SPECIALS = [
    "<|begin_of_text|>", "<|end_of_text|>", "<|start_header_id|>",
    "<|end_header_id|>", "<|eot_id|>",
]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Train a real byte-level BPE with the tokenizers library and load the
    SAME tokenizer.json with both implementations."""
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=600,
        special_tokens=LLAMA_SPECIALS,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(CORPUS * 4, trainer)
    path = tmp_path_factory.mktemp("tok") / "tokenizer.json"
    tok.save(str(path))
    return tok, BPETokenizer.from_file(path)


@pytest.mark.parametrize("text", CORPUS)
def test_encode_matches_tokenizers_oracle(trained, text):
    oracle, mine = trained
    assert mine.encode(text) == oracle.encode(text).ids


def test_encode_with_special_tokens_matches_oracle(trained):
    oracle, mine = trained
    text = ("<|begin_of_text|><|start_header_id|>user<|end_header_id|>\n\n"
            "What is the answer?<|eot_id|>")
    assert mine.encode(text) == oracle.encode(text).ids


@pytest.mark.parametrize("text", CORPUS)
def test_decode_roundtrip(trained, text):
    oracle, mine = trained
    ids = mine.encode(text)
    assert mine.decode(ids) == oracle.decode(ids, skip_special_tokens=False)
    assert mine.decode(ids) == text


def test_chat_template_llama3_format(trained):
    _, mine = trained
    out = mine.apply_chat_template(
        [{"role": "system", "content": "sys prompt"},
         {"role": "user", "content": "a question"}],
        add_generation_prompt=True,
    )
    assert out == (
        "<|begin_of_text|><|start_header_id|>system<|end_header_id|>\n\n"
        "sys prompt<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\na question<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\n"
    )
    # round-trips through encode/decode with specials as single ids
    ids = mine.encode(out)
    assert ids[0] == mine.special_tokens["<|begin_of_text|>"]
    assert mine.decode(ids) == out


def test_special_token_ids(trained):
    _, mine = trained
    assert mine.bos_token_id == mine.special_tokens["<|begin_of_text|>"]
    assert mine.eos_token_id == mine.special_tokens["<|eot_id|>"]


def test_ignore_merges_fast_path(tmp_path):
    """Llama-3 sets model.ignore_merges=true: whole pre-tokenized words
    already in the vocab bypass the merge loop."""
    b2u = bytes_to_unicode()
    word = "".join(b2u[b] for b in b"hello")
    space_h = "".join(b2u[b] for b in b" hello")
    vocab = {c: i for i, c in enumerate(sorted(set(word + space_h)))}
    vocab[word] = len(vocab)
    vocab[space_h] = len(vocab)
    j = {
        "added_tokens": [],
        "pre_tokenizer": None,
        "model": {
            "type": "BPE", "vocab": vocab, "merges": [],
            "ignore_merges": True,
        },
    }
    p = tmp_path / "t.json"
    p.write_text(json.dumps(j))
    tok = BPETokenizer.from_file(p)
    assert tok.encode("hello hello") == [vocab[word], vocab[space_h]]
    assert tok.decode(tok.encode("hello hello")) == "hello hello"


def test_build_prompt_uses_chat_template(trained):
    from medtok_tpu.qa.prompting import MCQ_INSTRUCTION, build_prompt

    _, mine = trained
    prompt = build_prompt("What is X?", chat_template=mine.chat_template_fn)
    assert prompt.startswith("<|begin_of_text|>")
    assert MCQ_INSTRUCTION in prompt
    assert prompt.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")
