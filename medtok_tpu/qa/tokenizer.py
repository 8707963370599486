"""First-party byte-level BPE tokenizer loading a HF ``tokenizer.json``.

The reference tokenizes QA prompts with the hub-downloaded Llama tokenizer
and its chat template (MedTok_fintune_llama3.py:93-132); this environment has
no hub access, so the tokenizer file format itself is implemented here:
vocab + ranked merges + byte-level pre-tokenization (the Llama-3 / GPT-4
family). Pure Python, no ``tokenizers`` dependency at runtime — the test
suite uses the installed ``tokenizers`` library as a parity oracle.

Scope: the pieces Llama-3's tokenizer.json actually uses — byte-level BPE
("ignore_merges" fast path, no normalizer, regex Split pre-tokenizer,
added special tokens). Not a general tokenizers-library reimplementation.
"""

from __future__ import annotations

import functools
import json
from pathlib import Path

# Llama-3's pre-tokenization split pattern (tokenizer.json pre_tokenizer ->
# Split.pattern.Regex; the GPT-4 pattern family). Used as the default when a
# file carries no explicit pattern.
LLAMA3_SPLIT_PATTERN = (
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}"
    r"| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
)


@functools.lru_cache(maxsize=1)
def bytes_to_unicode() -> dict[int, str]:
    """The GPT-2 byte<->printable-unicode bijection used by byte-level BPE
    (every byte maps to a visible char so merges operate on strings)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


@functools.lru_cache(maxsize=1)
def unicode_to_bytes() -> dict[str, int]:
    return {v: k for k, v in bytes_to_unicode().items()}


def _extract_split_pattern(pre_tok: dict | None) -> str:
    """Pull the Split regex out of a (possibly Sequence-wrapped)
    pre_tokenizer spec; fall back to the Llama-3 pattern."""
    if not pre_tok:
        return LLAMA3_SPLIT_PATTERN
    kind = pre_tok.get("type")
    if kind == "Sequence":
        for sub in pre_tok.get("pretokenizers", []):
            p = _extract_split_pattern(sub)
            if p is not LLAMA3_SPLIT_PATTERN:
                return p
        return LLAMA3_SPLIT_PATTERN
    if kind == "Split":
        pat = pre_tok.get("pattern", {})
        if "Regex" in pat:
            return pat["Regex"]
    if kind == "ByteLevel" and pre_tok.get("use_regex", True):
        # ByteLevel's built-in regex is the GPT-2 pattern
        return (
            r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+"
            r"| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"
        )
    return LLAMA3_SPLIT_PATTERN


class BPETokenizer:
    def __init__(
        self,
        vocab: dict[str, int],
        merges: list[tuple[str, str]],
        *,
        special_tokens: dict[str, int] | None = None,
        split_pattern: str = LLAMA3_SPLIT_PATTERN,
        ignore_merges: bool = False,
        add_prefix_space: bool = False,
    ):
        import regex

        self.vocab = vocab
        self.id_to_token = {i: t for t, i in vocab.items()}
        self.ranks = {tuple(m): r for r, m in enumerate(merges)}
        self.special_tokens = dict(special_tokens or {})
        self.id_to_special = {i: t for t, i in self.special_tokens.items()}
        self.ignore_merges = ignore_merges
        self.add_prefix_space = add_prefix_space
        self._split = regex.compile(split_pattern)
        self._special_split = (
            regex.compile(
                "(" + "|".join(regex.escape(t) for t in sorted(
                    self.special_tokens, key=len, reverse=True)) + ")"
            )
            if self.special_tokens else None
        )
        self._b2u = bytes_to_unicode()
        self._u2b = unicode_to_bytes()

    # ------------------------------------------------------------- load ----
    @classmethod
    def from_file(cls, path: str | Path) -> "BPETokenizer":
        j = json.loads(Path(path).read_text(encoding="utf-8"))
        model = j["model"]
        assert model.get("type", "BPE") == "BPE", model.get("type")
        merges = [
            tuple(m) if isinstance(m, list) else tuple(m.split(" ", 1))
            for m in model["merges"]
        ]
        specials = {
            t["content"]: t["id"]
            for t in j.get("added_tokens", [])
            if t.get("special", True)
        }
        vocab = dict(model["vocab"])
        vocab.update(specials)  # added tokens may extend the vocab
        byte_level = False
        pre = j.get("pre_tokenizer") or {}
        stack = [pre] + (pre.get("pretokenizers", []) if pre else [])
        add_prefix = any(
            s.get("type") == "ByteLevel" and s.get("add_prefix_space", False)
            for s in stack
        )
        del byte_level
        return cls(
            vocab, merges,
            special_tokens=specials,
            split_pattern=_extract_split_pattern(j.get("pre_tokenizer")),
            ignore_merges=model.get("ignore_merges", False),
            add_prefix_space=add_prefix,
        )

    # ------------------------------------------------------------ encode ---
    def _bpe_word(self, word: str) -> list[int]:
        if self.ignore_merges and word in self.vocab:
            return [self.vocab[word]]
        parts = list(word)
        while len(parts) > 1:
            best, best_rank = None, None
            for i in range(len(parts) - 1):
                r = self.ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            parts[best:best + 2] = [parts[best] + parts[best + 1]]
        out = []
        for p in parts:
            if p in self.vocab:
                out.append(self.vocab[p])
            # byte-level vocabularies contain all single bytes; anything
            # unmergeable but absent (malformed vocab) is dropped
        return out

    def encode(self, text: str, *, add_bos: bool = False) -> list[int]:
        ids: list[int] = []
        if add_bos and self.bos_token_id is not None:
            ids.append(self.bos_token_id)
        if self.add_prefix_space and text and not text.startswith(" "):
            text = " " + text
        chunks = (
            self._special_split.split(text) if self._special_split else [text]
        )
        for chunk in chunks:
            if not chunk:
                continue
            if chunk in self.special_tokens:
                ids.append(self.special_tokens[chunk])
                continue
            for piece in self._split.findall(chunk):
                word = "".join(self._b2u[b] for b in piece.encode("utf-8"))
                ids.extend(self._bpe_word(word))
        return ids

    # ------------------------------------------------------------ decode ---
    def decode(self, ids, *, skip_special_tokens: bool = False) -> str:
        out: list[str] = []
        buf = bytearray()

        def flush():
            if buf:
                out.append(buf.decode("utf-8", errors="replace"))
                buf.clear()

        for i in ids:
            i = int(i)
            if i in self.id_to_special:
                flush()
                if not skip_special_tokens:
                    out.append(self.id_to_special[i])
                continue
            tok = self.id_to_token.get(i)
            if tok is None:
                continue
            for ch in tok:
                b = self._u2b.get(ch)
                if b is not None:
                    buf.append(b)
        flush()
        return "".join(out)

    # ----------------------------------------------------------- specials --
    def _special_id(self, *names: str) -> int | None:
        for n in names:
            if n in self.special_tokens:
                return self.special_tokens[n]
        return None

    @property
    def bos_token_id(self) -> int | None:
        return self._special_id("<|begin_of_text|>", "<s>", "<bos>")

    @property
    def eos_token_id(self) -> int | None:
        # Llama-3-Instruct terminates turns with <|eot_id|>
        return self._special_id("<|eot_id|>", "<|end_of_text|>", "</s>", "<eos>")

    @property
    def pad_token_id(self) -> int:
        pid = self._special_id("<|finetune_right_pad_id|>", "<pad>")
        if pid is not None:
            return pid
        return self.eos_token_id if self.eos_token_id is not None else 0

    # ------------------------------------------------------- chat template --
    def apply_chat_template(
        self, messages: list[dict], *, add_generation_prompt: bool = True
    ) -> str:
        """The Llama-3 instruct turn format
        (<|start_header_id|>role<|end_header_id|>\\n\\n content <|eot_id|>),
        mirroring tokenizer.apply_chat_template(tokenize=False,
        add_generation_prompt=True) as called at
        MedTok_fintune_llama3.py:122-127."""
        required = ("<|begin_of_text|>", "<|start_header_id|>",
                    "<|end_header_id|>", "<|eot_id|>")
        missing = [t for t in required if t not in self.special_tokens]
        if missing:
            raise ValueError(
                f"tokenizer lacks Llama-3 chat specials: {missing}"
            )
        parts = ["<|begin_of_text|>"]
        for m in messages:
            parts.append(
                f"<|start_header_id|>{m['role']}<|end_header_id|>\n\n"
                f"{m['content']}<|eot_id|>"
            )
        if add_generation_prompt:
            parts.append("<|start_header_id|>assistant<|end_header_id|>\n\n")
        return "".join(parts)

    def chat_template_fn(self, system: str, user: str) -> str:
        """(system, user) -> rendered prompt; plugs into
        qa.prompting.build_prompt's chat_template argument."""
        return self.apply_chat_template(
            [{"role": "system", "content": system},
             {"role": "user", "content": user}],
            add_generation_prompt=True,
        )
