"""dompa_spark — a PySpark-native HTML parse/build + main-content
extraction engine with the query semantics of askonomm/dompa (reference
read-only at /root/reference), re-architected Spark-first:

- `dompa_spark.oracle`   — char-exact pure-Python reference semantics (tests only)
- `dompa_spark.kernel`   — vectorized numpy/Arrow batch kernels (the hot path)
- `dompa_spark.schema`   — fixed StructType schemas (input/output/flat-DOM)
- `dompa_spark.pipeline` — Spark jobs: mapInPandas wiring, salted
                           repartition, checkpoint/resume manifest
- `dompa_spark.corpus`   — deterministic synthetic corpus generator
- `dompa_spark.textops`  — training-data ops (dedup, similarity, quality,
                           sampling, contamination)
- `dompa_spark.graphops` — dedup clustering (connected components with
                           pointer jumping over near-dup pair graphs)
- `dompa_spark.media`    — multimodal binary columns
                           (featurize/frames/resize/dedup)
- `dompa_spark.pngcodec` — from-scratch stdlib PNG codec (filters 0-4)
- `dompa_spark.jpegcodec`— from-scratch JPEG codec (baseline + progressive)
- `dompa_spark.gifcodec` — from-scratch stdlib GIF codec (LZW)
- `dompa_spark.wavcodec` — from-scratch stdlib RIFF/PCM WAV codec
- `dompa_spark.y4mcodec` — from-scratch Y4M video codec (raw luma planes)
- `dompa_spark.avicodec` — from-scratch MJPEG-in-AVI container codec
- `dompa_spark.warc`     — WARC/ISO 28500 writer + parser (.warc, .warc.gz)
- `dompa_spark.wds`      — WebDataset tar-shard writer + parser
- `dompa_spark.pdfops`   — from-scratch ISO 32000 subset + XY-cut layout
- `dompa_spark.streaming`— Structured Streaming front-end (same kernels)
- `dompa_spark.dsl`      — node-construction DSL (the reference's $ / defhtml)
"""

__version__ = "0.1.0"
