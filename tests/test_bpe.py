"""BPE trainer/encoder vs an independent pure-Python reference
implementation (classic Sennrich word-frequency algorithm, written here
from the paper's pseudocode — no shared code with stages/bpe.py)."""

from collections import Counter

import pandas as pd
import pytest

_EOW = "</w>"


# --- independent reference trainer ------------------------------------------

def _ref_symbols(word):
    chars = list(word)
    chars[-1] = chars[-1] + _EOW
    return tuple(chars)


def ref_bpe_train(texts, n_merges, min_count=2):
    words = Counter()
    for t in texts:
        words.update(t.split())
    vocab = {_ref_symbols(w): n for w, n in words.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms[:-1], syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        # total order: max count, then lexicographically smallest pair
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((a, b, cnt))
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


CORPUS = [
    "low lower lowest low low",
    "new newer newest new new new",
    "the lower the newer the better",
    "wide wider widest wide",
    "low and lower and newest",
    "",
    "   ",
    "single",
]


@pytest.fixture(scope="module")
def corpus_ds(ray_session):
    import ray.data as rd

    return rd.from_items([{"doc_id": i, "text": t}
                          for i, t in enumerate(CORPUS)])


@pytest.mark.parametrize("threshold", [1 << 16, 0],
                         ids=["local-fast-path", "distributed-rounds"])
def test_bpe_train_matches_reference(corpus_ds, threshold):
    """Both regimes (driver-local rounds over the small vocab, and fully
    distributed rounds) reproduce the reference merge list exactly."""
    from docling_service_ray.stages.bpe import bpe_train

    got = bpe_train(corpus_ds, n_merges=12,
                    small_vocab_threshold=threshold).to_pandas()
    want = ref_bpe_train(CORPUS, 12)
    assert len(got) == len(want)
    for i, (a, b, cnt) in enumerate(want):
        row = got.iloc[i]
        assert (row["rank"], row["left"], row["right"], row["cnt"]) == \
            (i, a, b, cnt)


def test_bpe_train_parallelism_invariant(corpus_ds):
    """Distributed rounds are independent of block layout."""
    from docling_service_ray.stages.bpe import bpe_train

    a = bpe_train(corpus_ds, n_merges=8, small_vocab_threshold=0).to_pandas()
    b = bpe_train(corpus_ds.repartition(5), n_merges=8,
                  small_vocab_threshold=0).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_bpe_encode_roundtrip_and_compression(corpus_ds):
    """Tokens concatenate back to the word (+ marker), and learned merges
    strictly compress the training corpus vs character tokenization."""
    from docling_service_ray.stages.bpe import bpe_train, encode_word

    merges = bpe_train(corpus_ds, n_merges=12).to_pandas()
    rank_of = {(r["left"], r["right"]): int(r["rank"])
               for _, r in merges.iterrows()}
    total_tokens = total_chars = 0
    for t in CORPUS:
        for w in t.split():
            toks = encode_word(w, rank_of)
            assert "".join(toks) == w + _EOW  # lossless
            total_tokens += len(toks)
            total_chars += len(w)
    assert total_tokens < total_chars  # merges actually fired


def test_bpe_encode_stage(corpus_ds):
    """Actor-pool encode stage: n_bpe_tokens per doc equals the driver-side
    greedy encode; empty/whitespace docs yield zero counts."""
    import ray

    from docling_service_ray.stages.bpe import BpeEncode, bpe_train, encode_word

    merges = bpe_train(corpus_ds, n_merges=12)
    ref = ray.put(merges)
    out = (
        corpus_ds.map_batches(BpeEncode, fn_constructor_args=(ref,),
                              batch_format="pandas", concurrency=(1, 2))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    rank_of = {(left, right): int(rank)
               for rank, left, right in zip(merges["rank"].to_pylist(),
                                            merges["left"].to_pylist(),
                                            merges["right"].to_pylist())}
    for i, t in enumerate(CORPUS):
        words = t.split()
        assert out.loc[i, "n_words"] == len(words)
        assert out.loc[i, "n_bpe_tokens"] == sum(
            len(encode_word(w, rank_of)) for w in words)


def test_bpe_min_count_stops_early(ray_session):
    """No pair reaches min_count=2 -> zero merges (no degenerate rank-0
    merges of hapax pairs)."""
    import ray.data as rd

    from docling_service_ray.stages.bpe import bpe_train

    ds = rd.from_items([{"text": "ab cd ef"}])
    merges = bpe_train(ds, n_merges=4, min_count=2).to_pandas()
    assert len(merges) == 0


# ---------------------------------------------------------------------------
# property tests (pure kernels — no Ray per example)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_word = st.text(alphabet="abcdef", min_size=1, max_size=12)


@given(st.lists(st.lists(_word, max_size=8).map(" ".join), min_size=1,
                max_size=12), st.integers(min_value=0, max_value=20))
@settings(max_examples=150, deadline=None)
def test_local_rounds_match_reference_on_random_corpora(texts, n_merges):
    """The engine's local-rounds trainer is exactly the paper algorithm
    for ANY corpus and merge budget."""
    from collections import Counter

    from docling_service_ray.stages.bpe import _local_rounds

    words = Counter()
    for t in texts:
        words.update(t.split())
    wdf = pd.DataFrame({"word": list(words.keys()),
                        "n": list(words.values())})
    got = [(a, b, c) for _, a, b, c in _local_rounds(wdf, n_merges, 2)] \
        if len(wdf) else []
    assert got == ref_bpe_train(texts, n_merges)


@given(_word, st.lists(st.lists(_word, max_size=6).map(" ".join),
                       min_size=1, max_size=8))
@settings(max_examples=150, deadline=None)
def test_encode_word_lossless_for_any_learned_merges(word, texts):
    """Greedy encoding with ANY learned merge table concatenates back to
    the original word (+ end marker) — encoding is always lossless."""
    from docling_service_ray.stages.bpe import encode_word

    merges = ref_bpe_train(texts, 16)
    rank_of = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    toks = encode_word(word, rank_of)
    assert "".join(toks) == word + _EOW
    assert all(toks)  # no empty symbols
