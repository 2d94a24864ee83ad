"""Deterministic coin-shaped fixtures (FIXTURES.md B1): three JSON
batch files mirroring the CoinGecko /coins/markets payload the
reference ingests (data-extract.py:12-20), with overlapping symbol
sets so re-ingestion exercises MERGE, ~20% null max_supply/roi.

Seed=42 everywhere; timestamps are fixed literals, never wall-clock
(the reference's datetime.now() filenames, data-extract.py:24-27, are
replaced by explicit batch ids)."""

from __future__ import annotations

import json
import os
import random

N_PER_BATCH = 250
N_BATCHES = 3
BASE_TS = "2024-01-0{day}T00:{minute:02d}:00.000Z"


def _coin(rng: random.Random, idx: int, batch: int) -> dict:
    symbol = f"c{idx:04d}"
    price = round(rng.uniform(0.01, 70000.0), 6)
    supply = round(rng.uniform(1e6, 1e9), 2)
    cap = int(price * supply)
    null_supply = rng.random() < 0.2
    null_roi = rng.random() < 0.2
    return {
        "id": f"coin-{idx:04d}",
        "symbol": symbol,
        "name": f"Coin {idx:04d}",
        "image": f"https://img.example/{symbol}.png",
        "current_price": price,
        "market_cap": cap,
        "market_cap_rank": idx + 1,
        "fully_diluted_valuation": int(cap * 1.1),
        "total_volume": int(cap * rng.uniform(0.01, 0.2)),
        "high_24h": round(price * rng.uniform(1.0, 1.2), 6),
        "low_24h": round(price * rng.uniform(0.8, 1.0), 6),
        "price_change_24h": round(price * rng.uniform(-0.1, 0.1), 6),
        "price_change_percentage_24h": round(rng.uniform(-10, 10), 5),
        "market_cap_change_24h": int(cap * rng.uniform(-0.1, 0.1)),
        "market_cap_change_percentage_24h": round(rng.uniform(-10, 10), 5),
        "circulating_supply": supply,
        "total_supply": round(supply * 1.2, 2),
        "max_supply": None if null_supply else round(supply * 1.5, 2),
        "ath": round(price * rng.uniform(1.0, 3.0), 6),
        "ath_change_percentage": round(rng.uniform(-90, 0), 5),
        "ath_date": "2021-11-10T14:24:11.849Z",
        "atl": round(price * rng.uniform(0.01, 1.0), 6),
        "atl_change_percentage": round(rng.uniform(0, 5000), 5),
        "atl_date": "2020-03-13T02:22:55.391Z",
        "roi": None
        if null_roi
        else {
            "times": round(rng.uniform(-0.9, 50), 6),
            "currency": rng.choice(["btc", "eth", "usd"]),
            "percentage": round(rng.uniform(-90, 5000), 5),
        },
        "last_updated": BASE_TS.format(day=batch + 1, minute=idx % 60),
    }


def write_batches(out_dir: str, seed: int = 42) -> list[str]:
    """Write raw_coins_batch{0,1,2}.json. Batches overlap: batch b
    covers coin indices [b*100, b*100 + 250) — so consecutive batches
    share 150 symbols (updates) and bring 100 new ones (inserts)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for b in range(N_BATCHES):
        rng = random.Random(seed + b)
        rows = [_coin(rng, idx, b) for idx in range(b * 100, b * 100 + N_PER_BATCH)]
        p = os.path.join(out_dir, f"raw_coins_batch{b}.json")
        with open(p, "w") as f:
            json.dump(rows, f)
        paths.append(p)
    return paths


# ------------------------------------------------------- Zipf text corpus
# The driver's synthetic documents table has a ~20-word vocabulary —
# adversarial for sign-bit LSH (every bag-of-words vector is similar to
# every other, so buckets degenerate; the dedup_text_embedding band
# retune of round 4). Real corpora are Zipf-distributed over thousands
# of types, and LSH parameters should be validated on THAT distribution
# (VERDICT r4 #8). This fixture builds one, with PLANTED near-duplicate
# pairs (token-perturbed copies) so recall is measurable against a
# known ground truth.
ZIPF_VOCAB = 4000
ZIPF_EXPONENT = 1.05


def zipf_documents(
    n_docs: int = 1500,
    vocab_size: int = ZIPF_VOCAB,
    doc_len: tuple[int, int] = (30, 120),
    dup_frac: float = 0.1,
    perturb: float = 0.04,
    seed: int = 1234,
):
    """Deterministic Zipf-vocabulary corpus with planted near-dups.

    Returns (rows, planted): ``rows`` matches the documents.parquet
    schema (doc_id, text, lang, source, n_chars); ``planted`` lists
    (orig_id, dup_id) pairs where dup copies orig with ~``perturb`` of
    its tokens resampled — bag-of-words cosine stays near 1, so these
    are the true near-duplicates an LSH dedup must recover."""
    import bisect
    import itertools

    rng = random.Random(seed)
    weights = [1.0 / (r**ZIPF_EXPONENT) for r in range(1, vocab_size + 1)]
    cum = list(itertools.accumulate(weights))
    total = cum[-1]

    def word() -> str:
        return f"w{bisect.bisect_left(cum, rng.random() * total):05d}"

    n_base = int(n_docs * (1.0 - dup_frac))
    texts = [
        [word() for _ in range(rng.randint(*doc_len))] for _ in range(n_base)
    ]
    planted: list[tuple[int, int]] = []
    for d in range(n_base, n_docs):
        src = rng.randrange(n_base)
        toks = list(texts[src])
        for _ in range(max(1, int(len(toks) * perturb))):
            toks[rng.randrange(len(toks))] = word()
        texts.append(toks)
        planted.append((src, d))
    rows = [
        (d, " ".join(toks), "en", f"src{d % 4}", len(" ".join(toks)))
        for d, toks in enumerate(texts)
    ]
    return rows, planted
