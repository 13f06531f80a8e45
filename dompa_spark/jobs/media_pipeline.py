#!/usr/bin/env python3
"""spark-submit entry point for the multimodal media pipeline: every
media-family operator over one media table (media.MEDIA_SCHEMA
parquet) in ONE submit — decode telemetry, frame sampling, exact
dedup, and the three perceptual near-dup families — persisted as
parquet tables + one JSON summary line.

    spark-submit --py-files dompa_spark.zip \
        dompa_spark/jobs/media_pipeline.py \
        --input /path/media --output /path/out \
        [--every-ms 500] [--max-hamming 4] [--parts N]

Output layout ({output}/...):
    image_stats/   (media_ref, width, height, n_pixels, pixel_sum,
                    pixel_checksum) — real PNG/JPEG/GIF decodes
    audio_stats/   (media_ref, sample_rate, n_channels, n_samples,
                    sample_sum, sample_checksum) — real WAV decodes
    video_stats/   (media_ref, width, height, n_frames, fps_num,
                    fps_den, luma_sum, luma_checksum) — real Y4M decodes
    frames/        (media_ref, frame_idx, ts_ms, thumb) — real 4x4 luma
                    thumbs for Y4M, deterministic stub for the rest
    exact_dups/    featurize_media + media_dedup (sha-identical bytes)
    near_dups/     (family, media_ref_a, media_ref_b, hamming) — image
                    dHash / audio fingerprint / video fingerprint pairs
                    through the shared banded+salted hamming pairer
    summary.json   one-line rollup (also printed to stdout)

Scale shape: the input is hash-repartitioned on media_ref to --parts
(default: defaultParallelism) BEFORE the Arrow kernels — the same
contract as the extract job's part_id repartition: decode parallelism
is pinned by the plan, not by upstream file layout, and unique refs
are skew-free by construction. Every kernel runs strict=False (a real
crawl carries undecodable bytes; they drop out of the stats and ride
only the sha/stub paths). The raw binary column is NEVER cached — each
output re-scans the (columnar, kind-pruned) source, which at 100 TB is
strictly cheaper than pinning content bytes in executor storage; the
near-dup pairers cache only their slim (ref, band, key, hash) rows
internally. No new math here — every table is the library operators'
own, each covered by its DuckDB oracle query.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="dompa_spark media pipeline")
    p.add_argument("--input", required=True,
                   help="media table parquet (media.MEDIA_SCHEMA)")
    p.add_argument("--output", required=True)
    p.add_argument("--every-ms", type=int, default=500)
    p.add_argument("--max-hamming", type=int, default=4)
    p.add_argument("--parts", type=int, default=None,
                   help="decode parallelism (default: defaultParallelism)")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from dompa_spark import media, pipeline

    builder = SparkSession.builder.appName("dompa-spark-media-pipeline")
    if args.master:
        builder = builder.master(args.master)
    owns_session = SparkSession.getActiveSession() is None
    spark = pipeline.session_confs(builder).getOrCreate()

    parts = args.parts or spark.sparkContext.defaultParallelism
    tbl = (
        spark.read.parquet(args.input)
        .repartition(parts, "media_ref")
    )
    out = args.output
    try:
        images = tbl.filter(F.col("kind") == "image")
        audio = tbl.filter(F.col("kind") == "audio")
        video = tbl.filter(F.col("kind") == "video")

        media.decode_images(images, strict=False).write.mode(
            "overwrite").parquet(f"{out}/image_stats")
        media.decode_audio(audio, strict=False).write.mode(
            "overwrite").parquet(f"{out}/audio_stats")
        media.decode_video(video, strict=False).write.mode(
            "overwrite").parquet(f"{out}/video_stats")
        media.sample_frames(video, every_ms=args.every_ms).write.mode(
            "overwrite").parquet(f"{out}/frames")

        media.media_dedup(media.featurize_media(tbl)).write.mode(
            "overwrite").parquet(f"{out}/exact_dups")

        pairs = (
            media.media_near_dup(
                media.dhash_images(images, strict=False),
                max_hamming=args.max_hamming,
            ).select(F.lit("image").alias("family"), "*")
        ).unionByName(
            media.media_near_dup(
                media.audio_fingerprint(audio, strict=False),
                max_hamming=args.max_hamming, hash_col="afp",
            ).select(F.lit("audio").alias("family"), "*")
        ).unionByName(
            media.media_near_dup(
                media.video_fingerprint(video, strict=False),
                max_hamming=args.max_hamming, hash_col="vfp",
            ).select(F.lit("video").alias("family"), "*")
        )
        pairs.write.mode("overwrite").parquet(f"{out}/near_dups")

        kind_counts = {
            r.kind: r.n
            for r in tbl.groupBy("kind").agg(
                F.count("*").alias("n")).collect()
        }
        near_counts = {
            r.family: r.n
            for r in spark.read.parquet(f"{out}/near_dups")
            .groupBy("family").agg(F.count("*").alias("n")).collect()
        }
        summary = {
            "media": {k: int(v) for k, v in sorted(kind_counts.items())},
            "decoded_images": spark.read.parquet(
                f"{out}/image_stats").count(),
            "decoded_audio": spark.read.parquet(
                f"{out}/audio_stats").count(),
            "decoded_videos": spark.read.parquet(
                f"{out}/video_stats").count(),
            "frames": spark.read.parquet(f"{out}/frames").count(),
            "exact_dups": spark.read.parquet(f"{out}/exact_dups")
            .filter("is_dup").count(),
            "near_dups": {k: int(v)
                          for k, v in sorted(near_counts.items())},
        }
    finally:
        spark.catalog.clearCache()

    # summary through the Hadoop FS like the output tables (works on
    # any warehouse filesystem, not just a driver-local path)
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(f"{out}/summary.json")
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fout = fs.create(hpath, True)
    fout.write(bytearray(json.dumps(summary, sort_keys=True).encode()))
    fout.close()
    print(json.dumps(summary, sort_keys=True))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
