"""Probe driver-local BPE training at tokenizer-realistic merge counts.

The distributed loop pays one Spark job + a 1-row collect per merge
round — fine at the certified rounds=3, a non-starter at 32k merges.
The driver crossover (bpe_train collects the vocabulary-bounded
(word, freq) table once) must make 1k+ merges practical; this records
the wall split (corpus scan + collect vs pure merge loop) and
merges/sec for NOTES.

Usage: python tools/probe_bpe.py --rounds 1000 [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=1000)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--synthetic", type=int, default=0, metavar="N_WORDS",
                    help="probe on a deterministic synthetic vocabulary of"
                         " N distinct words instead of the sf corpus (the"
                         " fixtures' documents have a ~31-word vocabulary,"
                         " which exhausts after ~90 merges)")
    args = ap.parse_args()

    from keboola_storage_duckdb_spark.functions.bpe import (
        _bpe_train_driver, word_frequencies)

    t_collect = 0.0
    if args.synthetic:
        # Deterministic Zipf-ish vocabulary: md5-hex-derived word shapes
        # (letters only, 3-16 chars), freq = harmonic rank weight.
        import hashlib
        rows = []
        for i in range(args.synthetic):
            h = hashlib.md5(str(i).encode()).hexdigest()
            w = "".join(chr(ord("a") + int(c, 16) % 26)
                        for c in h[:3 + int(h[-1], 16) % 14])
            rows.append((w + str(i % 7), 1 + args.synthetic // (i + 1)))
        # distinct words (the suffix digit keeps collisions rare)
        seen: dict = {}
        for w, f in rows:
            seen[w] = seen.get(w, 0) + f
        rows = sorted(seen.items())
        print(f"synthetic vocab: {len(rows)} words", file=sys.stderr)
    else:
        from keboola_storage_duckdb_spark.session import get_spark

        spark = get_spark(app_name="probe_bpe")
        spark.sparkContext.setLogLevel("ERROR")
        docs = spark.read.parquet(
            os.path.join(args.sf, "documents.parquet"))
        t0 = time.perf_counter()
        rows = word_frequencies(docs, "text").collect()
        t_collect = time.perf_counter() - t0
        print(f"vocab: {len(rows)} words, collected in {t_collect:.2f}s",
              file=sys.stderr)

    t0 = time.perf_counter()
    merges, _ = _bpe_train_driver(rows, args.rounds)
    t_train = time.perf_counter() - t0
    print(f"rounds={args.rounds} learned={len(merges)} "
          f"train={t_train:.2f}s ({len(merges) / max(t_train, 1e-9):.0f} "
          f"merges/sec) collect={t_collect:.2f}s "
          f"last_merge={merges[-1]['merged'] if merges else None} "
          f"last_count={merges[-1]['pair_count'] if merges else None}")


if __name__ == "__main__":
    main()
