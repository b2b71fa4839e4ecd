"""Multimodal curation pipeline over a mixed binary-payload table —
the triage-then-route pass a crawl's media columns go through before
training, each stage one of the engine's operators:

    mixed payload table (png/gif/wav/avi + junk) ->
    media_probe triage (codec-free header metadata; corrupt rows land
    as 'unknown', never an error) ->
    route by sniffed format:
      images -> pure PNG/GIF decode -> dHash -> banded image
                near-dup -> drop non-canonical copies
      audio  -> pure WAV decode -> spectral fingerprint ->
                banded audio near-dup -> drop non-canonical copies
      video  -> MJPEG-in-AVI frame extraction -> per-frame dHash
    -> per-format keep/drop report

Run: python examples/multimodal_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    import numpy as np

    from muopdb_spark.operators.audio import audio_near_dup, encode_wav
    from muopdb_spark.operators.gif import encode_gif
    from muopdb_spark.operators.image import encode_png, image_near_dup
    from muopdb_spark.operators.multimodal import media_probe
    from muopdb_spark.operators.video import (
        encode_avi_mjpeg,
        video_frame_features,
    )
    from muopdb_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("multimodal-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- 1. build a mixed media table from the documents fixture:
    # every doc gets a deterministic payload; every 10th image/audio
    # payload is a near-duplicate (brightness shift / gain) of its
    # class base, and a few rows are corrupt on purpose
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    def synth(batches):
        import pandas as pd

        rows = {"doc_id": [], "content": []}
        for pdf in batches:
            for d in pdf["doc_id"]:
                d = int(d)
                m = d % 5
                if m == 0:  # png; class base = d // 25, per-member shift
                    r = np.arange(16)[:, None] * 977 + np.arange(18) * 313
                    px = ((d // 25) * 2654435761 ^ r) % 199 + ((d // 5) % 3)
                    payload = encode_png(px.astype(np.uint8))
                elif m == 1:  # audio; per-member power-of-two gain
                    i = np.arange(2048, dtype=np.int64)
                    s = (((d // 25) * 40503 ^ i * 2246822519) % 16001
                         - 8000) * (1 << ((d // 5) % 2))
                    payload = encode_wav(s.astype(np.int16), 16000)
                elif m == 2:  # non-media junk
                    payload = b"\x00junk" + d.to_bytes(4, "little")
                elif m == 3:  # REAL gif (lossless); same class scheme
                    r = np.arange(16)[:, None] * 977 + np.arange(18) * 313
                    px = ((d // 25) * 2654435761 ^ r) % 199 + ((d // 5) % 3)
                    payload = encode_gif(px.astype(np.uint8))
                else:  # MJPEG-in-AVI, 2-4 flat frames
                    frames = [
                        np.full((16, 24), (d * 7 + k * 11) % 256, np.uint8)
                        for k in range(2 + d % 3)
                    ]
                    payload = encode_avi_mjpeg(frames, fps=4, quality=100)
                rows["doc_id"].append(d)
                rows["content"].append(payload)
            yield pd.DataFrame(rows)
            rows = {"doc_id": [], "content": []}

    media = docs.repartition(8).mapInPandas(
        synth, "doc_id long, content binary"
    )

    # ---- 2. codec-free triage: one header-parse pass over everything
    probe = media_probe(media).cache()
    print("\n== media_probe triage ==")
    probe.groupBy("format").agg(
        F.count("*").alias("n"),
        F.sum("n_bytes").alias("bytes"),
    ).orderBy("format").show()

    # ---- 3. route by sniffed format and dedup each modality
    pngs = media.join(
        probe.filter(F.col("format").isin("png", "gif"))
        .select("doc_id"), "doc_id"
    )
    wavs = media.join(
        probe.filter(F.col("format") == "wav").select("doc_id"), "doc_id"
    )
    avis = media.join(
        probe.filter(F.col("format") == "avi").select("doc_id"), "doc_id"
    )
    img_pairs = image_near_dup(pngs, max_hamming=3)
    wav_pairs = audio_near_dup(wavs, max_hamming=3)
    # keep-first resolution: the lower doc_id of each pair is canonical
    img_drop = img_pairs.select(F.col("b_id").alias("doc_id")).distinct()
    wav_drop = wav_pairs.select(F.col("b_id").alias("doc_id")).distinct()

    n_png, n_wav = pngs.count(), wavs.count()
    d_png, d_wav = img_drop.count(), wav_drop.count()
    print("== near-dup routing ==")
    print(f"images: {n_png} decoded, {d_png} near-dup copies dropped, "
          f"{n_png - d_png} kept")
    print(f"audio:  {n_wav} decoded, {d_wav} near-dup copies dropped, "
          f"{n_wav - d_wav} kept")

    # ---- 3b. video: extract every MJPEG frame (real decode) and
    # report the per-document frame yield
    frames = video_frame_features(avis)
    agg = frames.groupBy().agg(
        F.countDistinct("doc_id").alias("docs"),
        F.count("*").alias("frames"),
    ).collect()[0]
    print(f"video:  {agg.docs} AVIs decoded, {agg.frames} frames "
          f"extracted (per-frame dHash ready for near-dup)")

    kept = media.join(
        img_drop.unionByName(wav_drop), "doc_id", "left_anti"
    )
    print(f"final media table: {kept.count()} rows "
          f"(junk retained as typed 'unknown' rows for downstream triage)")
    spark.stop()


if __name__ == "__main__":
    main()
