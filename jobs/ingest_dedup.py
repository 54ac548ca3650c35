"""Continuous-ingest cross-corpus dedup CLI — the operational face of
the persisted MinHash band index (operators/dedup.build_minhash_index /
pairs_against_index / append_to_minhash_index) and the streaming drain
(streaming/validate_stream.run_ingest_dedup):

  --build-from T.parquet   build/rebuild the index from a standing
                           corpus (one scan), then exit
  --input DIR              drain new parquet files from DIR
                           (Trigger.AvailableNow + Spark's source
                           checkpoint: re-running processes ONLY files
                           added since the last run), probe each
                           micro-batch against the index, write
                           flagged pairs + surviving docs, fold
                           survivors into the index

Outputs under --output: flagged/ (id_new, id_indexed, est_jaccard,
batch_id), kept/ (surviving docs + batch_id), and — with
--exact-index — flagged_exact/ (id_new, id_indexed, n_indexed_copies,
batch_id: byte-identical copies caught by the digest probe before any
signature is computed). Prints ONE JSON summary line; exit 0 on
success.

--modality embedding drains VECTOR files instead: the persisted
hyperplane-LSH index (similarity.build_embedding_index) is probed per
micro-batch with exact-cosine verify against the stored vectors, and
survivors fold in — the embedding twin of the text drain.

Scale shape: the standing corpus is probed, never re-paired — each
drain costs one (band, bucket) equi-join streamed from the batch side
plus one signature append. The index IS the state: 16 band partitions
of (id, sig, bucket) rows, manifest-counted, growing monotonically
with every drain.

spark-submit --py-files engine.zip jobs/ingest_dedup.py \
    --index /data/mh_index --input /data/ingest \
    --output /out --checkpoint /ckpt --threshold 0.8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from intent_classifier_service_spark.operators import dedup  # noqa: E402
from intent_classifier_service_spark.session import get_spark  # noqa: E402
from intent_classifier_service_spark.streaming import (  # noqa: E402
    validate_stream as VS)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True,
                    help="persisted MinHash band index directory")
    ap.add_argument("--build-from", default=None,
                    help="standing-corpus parquet: (re)build the index "
                         "from it and exit")
    ap.add_argument("--input", default=None,
                    help="ingest directory of parquet document files")
    ap.add_argument("--output", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--threshold", type=float, default=None,
                    help="flag threshold; defaults per modality "
                         "(text est_jaccard 0.7, embedding cosine 0.95)")
    ap.add_argument("--no-append", action="store_true",
                    help="probe only: do not fold survivors into the "
                         "index")
    ap.add_argument("--exact-index", default=None,
                    help="persisted exact-digest index directory: "
                         "byte-identical (modulo normalization) copies "
                         "are flagged and dropped BEFORE the near-dup "
                         "probe; built alongside the MinHash index "
                         "under --build-from (text modality only)")
    ap.add_argument("--modality", choices=("text", "embedding"),
                    default="text",
                    help="text: MinHash band index over (doc_id, text); "
                         "embedding: hyperplane-LSH index over (vec_id, "
                         "embedding array<float>) with exact-cosine "
                         "verify (threshold is a cosine, e.g. 0.95)")
    args = ap.parse_args()
    if args.modality == "embedding" and args.exact_index:
        ap.error("--exact-index applies to the text modality only")

    spark = get_spark("ingest_dedup")
    t0 = time.time()

    if args.build_from:
        docs = spark.read.parquet(args.build_from)
        if args.modality == "embedding":
            from intent_classifier_service_spark.operators import similarity
            manifest = similarity.build_embedding_index(docs, args.index)
        else:
            manifest = dedup.build_minhash_index(docs, args.index)
        out = {"mode": "build", "modality": args.modality,
               "index": args.index, **manifest}
        if args.exact_index:
            ex_manifest = dedup.build_exact_index(docs, args.exact_index)
            out["exact_index"] = args.exact_index
            out["exact_n_docs"] = ex_manifest["n_docs"]
        print(json.dumps({**out,
                          "wall_sec": round(time.time() - t0, 3)}))
        return 0

    if not (args.input and args.output and args.checkpoint):
        ap.error("--input/--output/--checkpoint required unless "
                 "--build-from")

    if args.modality == "embedding":
        thr = 0.95 if args.threshold is None else args.threshold
        VS.run_ingest_embedding_dedup(
            spark, args.input, args.index, args.output, args.checkpoint,
            threshold=thr,
            append_survivors=not args.no_append)
    else:
        thr = 0.7 if args.threshold is None else args.threshold
        VS.run_ingest_dedup(
            spark, args.input, args.index, args.output, args.checkpoint,
            threshold=thr,
            append_survivors=not args.no_append,
            exact_index_path=args.exact_index)

    def _n(path: str) -> int:
        try:
            return spark.read.parquet(path).count()
        except Exception:
            return 0  # sink absent: no batch produced rows

    manifest = dedup._read_mh_manifest(args.index)
    summary = {
        "mode": "drain",
        "n_flagged_pairs_total": _n(os.path.join(args.output, "flagged")),
        "n_kept_docs_total": _n(os.path.join(args.output, "kept")),
        "index_n_docs": manifest["n_docs"],
        "index_n_appends": manifest["n_appends"],
    }
    if args.exact_index:
        ex = dedup._read_mh_manifest(args.exact_index)
        summary["n_flagged_exact_total"] = _n(
            os.path.join(args.output, "flagged_exact"))
        summary["exact_index_n_docs"] = ex["n_docs"]
    print(json.dumps({**summary,
                      "wall_sec": round(time.time() - t0, 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
