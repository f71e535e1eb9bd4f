"""CLIP-exact tokenization readiness (VERDICT round-1 item 7).

Two layers of evidence for the real-merges code path
(oryon_tpu/models/tokenizer.py:94-107), which cannot run in-sandbox because
the published ``bpe_simple_vocab_16e6.txt.gz`` is absent (zero egress):

1. A committed golden fixture of published CLIP token ids.  The test is
   SKIPPED while the merges file is absent and will run (and must pass) the
   moment the asset lands at any of the known locations.
2. A merges-independent word-split parity test: the stdlib-``re`` fallback
   pattern must split text exactly like the regex-module pattern the
   published tokenizer uses (reference models/tokenizer.py:79), so token ids
   cannot diverge at the pre-tokenization stage.
3. The REAL merge loop runs in-sandbox over a toy merges table (round 3):
   hand-derived segmentations plus id-level parity against the reference's
   own SimpleTokenizer driven with the same file — only the asset-gated
   published-id fixture still skips.
"""
import os
import re

import pytest

from oryon_tpu.models.tokenizer import ClipTokenizer

MERGES_CANDIDATES = [
    "pretrained_models/bpe_simple_vocab_16e6.txt.gz",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "pretrained_models/bpe_simple_vocab_16e6.txt.gz"),
]

# Published OpenAI CLIP token ids (SimpleTokenizer over
# bpe_simple_vocab_16e6.txt.gz).  SOT/EOT framing added by __call__.
GOLDEN = [
    ("a photo of a cat", [320, 1125, 539, 320, 2368]),
    ("a photo of a dog", [320, 1125, 539, 320, 1929]),
    ("the", [518]),
]


def _merges_path():
    for p in MERGES_CANDIDATES:
        if os.path.exists(p):
            return p
    return None


def test_golden_token_ids():
    path = _merges_path()
    if path is None:
        pytest.skip("bpe_simple_vocab_16e6.txt.gz absent (zero-egress "
                    "sandbox); golden ids verified once assets land")
    tok = ClipTokenizer(path)
    assert tok.vocab_size == 49408
    assert tok.sot == 49406 and tok.eot == 49407
    for text, ids in GOLDEN:
        got = tok.encode(text)
        assert got == ids, f"{text!r}: got {got}, published {ids}"


def test_sot_eot_ids_are_fixed():
    """SOT/EOT ids are structural (256*2 byte vocab + 48894 merges) and must
    hold for BOTH the real vocab and the byte-fallback (the fallback pads
    no merges, so its ids differ — this documents the real-vocab contract)."""
    tok = ClipTokenizer()  # fallback
    # fallback: 512 byte tokens + SOT + EOT
    assert tok.sot == 512 and tok.eot == 513
    assert VOCAB_REAL_SOT == 49406 and VOCAB_REAL_EOT == 49407


VOCAB_REAL_SOT = 256 * 2 + 48894  # = 49406
VOCAB_REAL_EOT = VOCAB_REAL_SOT + 1


def test_fallback_pattern_matches_regex_module():
    """The stdlib-re fallback word pattern splits like the regex-module
    pattern (letters/digits/punctuation incl. '_'), so pre-tokenization is
    identical whichever module is installed."""
    regex = pytest.importorskip("regex")
    std = re.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
        r"""[^\W\d_]+|\d|(?:[^\s\w]|_)+""", re.IGNORECASE | re.UNICODE)
    rx = regex.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
        r"""[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""", regex.IGNORECASE)
    samples = [
        "a photo of a cat", "it's the user's dog!", "hello_world",
        "x _ y a__b", "12 drills", "café menu", "a-b c_d e.f",
        "<|startoftext|>hi<|endoftext|>", "they're we've i'll i'd i'm",
        "3.14 is pi", "snake_case_name", "  spaced   out  ",
    ]
    for s in samples:
        assert std.findall(s) == rx.findall(s), s


def test_active_pattern_handles_underscore():
    """Whichever pattern got compiled at import, '_' must tokenize."""
    tok = ClipTokenizer()
    assert tok.pat.findall("hello_world") == ["hello", "_", "world"]
    ids = tok.encode("hello_world")
    assert len(ids) > 0

def test_encode_memo_is_mutation_safe():
    """encode() is memoized; a caller mutating the returned list must not
    poison the cache (the memo stores immutable tuples, returns fresh
    lists)."""
    tok = ClipTokenizer()
    a = tok.encode("a photo of a drill")
    want = list(a)
    a.append(999999)          # caller-side mutation
    b = tok.encode("a photo of a drill")   # memo hit
    assert b == want
    b[0] = -1
    assert tok.encode("a photo of a drill") == want


TOY_MERGES = [
    # rank order is the merge priority; hand-picked to exercise every branch
    # of the merge loop (oryon_tpu/models/tokenizer.py:124-160):
    ("h", "e"),            # 0: plain pair merge
    ("he", "l"),           # 1: merge consuming a previous merge's output
    ("l", "o</w>"),        # 2: </w>-suffixed pair
    ("hel", "lo</w>"),     # 3: final merge -> single token, len==1 break
    ("a", "a"),            # 4: multi-occurrence scan within one word
    ("a", "a</w>"),        # 5: trailing </w> variant of the same char
    ("aa", "aa</w>"),      # 6
    ("l", "o"),            # 7: 'lol' -> first occurrence merges, tail stays
]


def _toy_merges_file(tmp_path):
    import gzip

    p = str(tmp_path / "toy_merges.txt.gz")
    lines = ["#version: toy"] + [f"{a} {b}" for a, b in TOY_MERGES]
    with gzip.open(p, "wt", encoding="utf-8") as f:
        # no trailing newline: the reference's line slice turns a final
        # empty line into a degenerate '' vocab entry that shifts SOT/EOT
        # (the published 16e6 file has exactly 48895 lines, no tail)
        f.write("\n".join(lines))
    return p


def test_bpe_merge_loop_hand_derived(tmp_path):
    """The REAL merge loop runs in-sandbox (VERDICT r2 missing #5) against
    hand-derived expectations over a toy merges table."""
    tok = ClipTokenizer(_toy_merges_file(tmp_path))
    assert tok.bpe_ranks, "toy merges not loaded"
    # hello: h e -> he | he l -> hel | l o</w> -> lo</w> | hel lo</w> -> one
    assert tok.bpe("hello") == "hello</w>"
    # lol: (l,o) rank 7 merges the FIRST occurrence; (o,l</w>) unranked
    assert tok.bpe("lol") == "lo l</w>"
    # aaaa: (a,a) merges greedily left-to-right, then (a,a</w>), then the
    # pair of merged halves -> exercises word.index(first, i) scanning and
    # the mid-word else branch
    assert tok.bpe("aaaa") == "aaaa</w>"
    assert tok.bpe("aaa") == "aa a</w>"
    # unknown pairs: untouched split
    assert tok.bpe("xyz") == "x y z</w>"
    # encode maps merged tokens to the vocab ids (base 512 + merge order)
    base = 512
    assert tok.encode("hello") == [base + 3]
    assert tok.encode("aaaa") == [base + 6]
    # cache returns the same object, never poisoned
    assert tok.bpe("hello") == "hello</w>"


def test_bpe_merge_loop_matches_reference(tmp_path):
    """Repo ClipTokenizer == the reference's SimpleTokenizer
    (reference models/tokenizer.py:88-127) over the SAME toy merges file:
    identical token ids for a battery of strings that hit contractions,
    punctuation, numerals, UTF-8 multibyte, and the merge loop."""
    pytest.importorskip("regex")
    from tests._reference_shim import ref_import

    ref_mod = ref_import("models.tokenizer")
    path = _toy_merges_file(tmp_path)
    ref = ref_mod.SimpleTokenizer(bpe_path=path)
    tok = ClipTokenizer(path)
    battery = [
        "hello", "hello world", "a hello", "lol aaaa aaa",
        "it's hell", "don't stop", "Hello, World!", "x1y2z3",
        "  spaced   out  ", "café hello", "a.b,c;d", "HELLO",
        "hellohello", "aaaaaaaa", "",
    ]
    for text in battery:
        got = tok.encode(text)
        want = ref.encode(text)
        assert got == want, f"{text!r}: repo {got} vs reference {want}"
    # vocab tables agree end to end (same layout contract the converters
    # rely on: 256 bytes + 256 byte</w> + merges + SOT/EOT)
    assert tok.encoder == ref.encoder
    assert tok.sot == ref.encoder["<|startoftext|>"]
    assert tok.eot == ref.encoder["<|endoftext|>"]
