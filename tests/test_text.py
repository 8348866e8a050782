"""Prompt-language tests: emphasis parsing, scheduling, AND-composition,
chunking — against the documented webui semantics."""

import numpy as np
import pytest

from forge_tpu.text.emphasis import parse_prompt_attention
from forge_tpu.text.schedule import get_schedule, split_composable
from forge_tpu.text.chunking import tokenize_line, CHUNK_LEN


class TokMock:
    """Deterministic fake tokenizer: 1 token per word, comma its own token."""

    bos, eos, comma = 1, 2, 3

    def ids(self, text):
        out = []
        for word in text.replace(",", " , ").split():
            out.append(self.comma if word == "," else 100 + (hash(word) % 1000))
        return out


def test_emphasis_basic():
    assert parse_prompt_attention("normal text") == [("normal text", 1.0)]
    assert parse_prompt_attention("an (important) word") == [
        ("an ", 1.0), ("important", 1.1), (" word", 1.0),
    ]
    assert parse_prompt_attention("(unbalanced") == [("unbalanced", 1.1)]


def test_emphasis_weights():
    assert parse_prompt_attention("(unnecessary)(parens)") == [("unnecessaryparens", 1.1)]
    res = parse_prompt_attention("(a:1.5)")
    assert res == [("a", 1.5)]
    res = parse_prompt_attention("((a))")
    assert abs(res[0][1] - 1.21) < 1e-9
    res = parse_prompt_attention("[b]")
    assert abs(res[0][1] - 1 / 1.1) < 1e-9


def test_emphasis_escapes():
    assert parse_prompt_attention(r"\(literal\]") == [("(literal]", 1.0)]


def test_emphasis_break():
    res = parse_prompt_attention("a BREAK b")
    assert ("BREAK", -1.0) in res


def test_schedule_static():
    assert get_schedule("plain prompt", 10) == [(10, "plain prompt")]


def test_schedule_switch():
    assert get_schedule("a [cat:dog:0.5] x", 10) == [(5, "a cat x"), (10, "a dog x")]
    assert get_schedule("[from:to:3]", 10) == [(3, "from"), (10, "to")]


def test_schedule_add_remove():
    assert get_schedule("[late:5]", 10) == [(5, ""), (10, "late")]
    assert get_schedule("[early::5]", 10) == [(5, "early"), (10, "")]


def test_schedule_alternate():
    sched = get_schedule("[a|b]", 4)
    assert sched == [(1, "a"), (2, "b"), (3, "a"), (4, "b")]


def test_schedule_nested():
    sched = get_schedule("[a:[b:c:0.75]:0.5]", 8)
    assert sched == [(4, "a"), (6, "b"), (8, "c")]


def test_and_composition():
    parts = split_composable("a cat AND a dog:0.4")
    assert parts == [("a cat", 1.0), ("a dog", 0.4)]


def test_chunking_simple():
    tok = TokMock()
    chunks, count = tokenize_line("hello world", tok)
    assert len(chunks) == 1
    assert len(chunks[0].tokens) == CHUNK_LEN
    assert count == 2


def test_chunking_break_forces_boundary():
    tok = TokMock()
    chunks, _ = tokenize_line("a BREAK b", tok)
    assert len(chunks) == 2


def test_chunking_overflow():
    tok = TokMock()
    words = " ".join(f"w{i}" for i in range(100))
    chunks, count = tokenize_line(words, tok)
    assert len(chunks) == 2
    assert count == CHUNK_LEN + 25


def test_chunking_comma_backtrack():
    tok = TokMock()
    # 70 words, comma, 10 more words: the 10-word tail should move to chunk 2
    text = " ".join(f"w{i}" for i in range(70)) + " , " + " ".join(f"x{i}" for i in range(10))
    chunks, _ = tokenize_line(text, tok)
    assert len(chunks) == 2
    # chunk 1 ends at the comma; the tail words all live in chunk 2
    tail_ids = [100 + (hash(f"x{i}") % 1000) for i in range(10)]
    assert chunks[1].tokens[:10] == tail_ids
