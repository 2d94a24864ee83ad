"""Driver-harness self-audit batch (VERDICT r15 item 7: rotate
~15 never-driver-sampled queries per round through the EXACT driver
compare at sf0.01, recorded in CORRECTNESS_LOCAL_sf0.01.md).

Runs each named query from __spark_entry__.queries() against its
oracle_sql() in DuckDB via tests/oracle_compare.compare (rows +
schema + order-insensitive value multiset) — the local replica of
the driver's CORRECTNESS gate.

Usage: python scripts/audit_sf001.py name1 name2 ...
       python scripts/audit_sf001.py --default   (the round-16 batch)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

# round-16 rotation: never-driver-sampled heavies + every r16 addition
DEFAULT_BATCH = [
    # r16 additions
    "multimodal_audio_mp3_esc",
    "multimodal_audio_mp3_mpeg25",
    "multimodal_audio_mpeg_l1_lsf",
    "multimodal_audio_mpeg_l2_lsf",
    "multimodal_audio_pcm_synth",
    "pdf_text_extract_aes",
    "pdf_text_extract_aes256",
    "pdf_text_form_xobject",
    # never-driver-sampled rotation
    "hits_hosts",
    "ann_recall_curve",
    "dedup_embedding_lsh",
    "dedup_substring",
    "decontaminate",
    "similarity_ivfpq",
    "bm25_score",
    "tfidf_top_terms",
    "pack_sequences",
    "corpus_datacard",
    "multimodal_video_mpeg",
    "multimodal_jpeg_pixels",
    "sessionize",
    "scd2_customer_tiers",
    "q21_waiting_suppliers",
]


def main() -> int:
    names = sys.argv[1:]
    if not names or names == ["--default"]:
        names = DEFAULT_BATCH
    sf_dir = "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    from oracle_compare import compare, duck_connection

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    con = duck_connection(sf_dir)
    failed = []
    for name in names:
        t0 = time.time()
        try:
            problems = compare(qs[name](spark, sf_dir), con, osql[name], name)
        except Exception as exc:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(exc).__name__}: {exc}"]
        dt = time.time() - t0
        status = "PASS" if not problems else "FAIL"
        print(f"[{status}] {name} ({dt:.1f}s)" + (
            "" if not problems else " :: " + "; ".join(problems)[:300]
        ))
        if problems:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} pass")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
