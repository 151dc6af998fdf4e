

def test_video_frame_hashes_and_near_dup_pairs(spark):
    """Two videos sharing most frames are near-dups; an unrelated video
    is not; a corrupt payload degrades to one ok=false row."""
    import numpy as np

    from morphik_core_spark.functions.video import encode_avi_mjpeg
    from morphik_core_spark.operators.multimodal import (
        video_frame_hashes,
        video_near_dup_pairs,
    )

    # structured frames (random noise hashes unstably under JPEG); dhash
    # reads horizontal gradients, so distinct content needs distinct
    # gradient STRUCTURE, not shifts/brightness of one periodic pattern
    def frame(k):
        i = np.arange(64, dtype=np.float64)
        f = ((np.sin(np.outer(i / (2.0 + k), i / 7.0)) + 1.0) * 120).astype(np.uint8)
        return np.stack([f, f, f], axis=2)

    base = [frame(k) for k in (1, 2, 3, 4)]
    v1 = encode_avi_mjpeg(base, fps=2.0)
    v2 = encode_avi_mjpeg(base[:3] + [frame(9)], fps=2.0)  # 3/5 of the union shared
    v3 = encode_avi_mjpeg([frame(k) for k in (20, 30, 40, 50)], fps=2.0)

    rows = [("v1", bytearray(v1)), ("v2", bytearray(v2)), ("v3", bytearray(v3)), ("bad", bytearray(b"nope"))]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    fh = video_frame_hashes(df, max_frames=8)
    got = fh.collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r.media_id, []).append(r)
    assert len(by_id["v1"]) == 4 and all(r.ok for r in by_id["v1"])
    assert len(by_id["bad"]) == 1 and not by_id["bad"][0].ok
    pairs = {(r.id_a, r.id_b): r.jaccard for r in video_near_dup_pairs(fh, threshold=0.3).collect()}
    assert ("v1", "v2") in pairs and pairs[("v1", "v2")] >= 0.3
    assert all({a, b} != {"v1", "v3"} and {a, b} != {"v2", "v3"} for a, b in pairs)


def test_video_near_dup_hot_hash_cap(spark):
    from morphik_core_spark.operators.multimodal import video_near_dup_pairs

    # 4 videos all sharing one degenerate hash; cap at 3 drops it
    rows = [(f"v{i}", True, None, 1, 0, 42) for i in range(4)]
    fh = spark.createDataFrame(
        rows, "media_id string, ok boolean, err string, n_frames int, frame_idx int, hash long"
    )
    assert video_near_dup_pairs(fh, threshold=0.1).count() == 6
    assert video_near_dup_pairs(fh, threshold=0.1, max_hash_df=3).count() == 0


def test_video_frame_sampling_cap(spark):
    import numpy as np

    from morphik_core_spark.functions.video import encode_avi_mjpeg
    from morphik_core_spark.operators.multimodal import video_frame_hashes

    x = np.tile(np.arange(32, dtype=np.uint8) * 8, (32, 1))
    frames = [np.stack([np.roll(x, s, 1)] * 3, 2).astype(np.uint8) for s in range(12)]
    df = spark.createDataFrame(
        [("v", bytearray(encode_avi_mjpeg(frames, fps=4.0)))], "media_id string, payload binary"
    )
    out = video_frame_hashes(df, max_frames=5).collect()
    assert len(out) == 5
    assert all(r.n_frames == 12 for r in out)
    assert [r.frame_idx for r in sorted(out, key=lambda r: r.frame_idx)] == [0, 2, 4, 7, 9]
