

def test_image_neardup_recovers_planted_pairs(spark):
    """aHash over real pattern BMPs + the banded Hamming join recover
    exactly the planted (id, id+offset) variant pairs at Hamming 2."""
    from ensembl_database_loader_spark.multimodal.binaryops import (
        ahash64,
        build_pattern_media,
        encode_pattern_bmp24,
        image_neardup_pairs,
    )

    ids = spark.createDataFrame([(i,) for i in range(1, 61)], "doc_id bigint")
    media = build_pattern_media(ids, "doc_id", variant_offset=10_000)
    assert media.count() == 120
    pairs = image_neardup_pairs(media, max_hamming=4).collect()
    got = {(r.id1, r.id2): r.hamming for r in pairs}
    assert got == {(i, i + 10_000): 2 for i in range(1, 61)}
    # perceptual, not byte-level: re-encoding with a different cell
    # size (a RESIZED image) hashes identically
    import pytest

    bits = 0x1795DFB1CE254312
    assert ahash64(encode_pattern_bmp24(bits, 2)) == ahash64(
        encode_pattern_bmp24(bits, 4)
    )
    with pytest.raises(ValueError, match="magic"):
        ahash64(b"nope")
    with pytest.raises(ValueError, match="flip_cells"):
        build_pattern_media(ids, "doc_id", flip_cells=0).collect()


def test_audio_neardup_recovers_planted_pairs(spark):
    """Amplitude-envelope hashing over real WAVs + the banded Hamming
    join recover exactly the planted variant pairs — the audio twin of
    the image case, one dedup engine across modalities."""
    import pytest

    from ensembl_database_loader_spark.multimodal.binaryops import (
        audiohash64,
        build_envelope_media,
        encode_envelope_wav16,
        _pattern_bits,
        audio_neardup_pairs,
    )

    ids = spark.createDataFrame([(i,) for i in range(1, 41)], "doc_id bigint")
    media = build_envelope_media(ids, "doc_id", variant_offset=10_000)
    assert media.count() == 80
    pairs = audio_neardup_pairs(media, max_hamming=4).collect()
    got = {(r.id1, r.id2): r.hamming for r in pairs}
    assert got == {(i, i + 10_000): 2 for i in range(1, 41)}
    # envelope hashing is duration/sample-rate invariant
    bits = _pattern_bits(5)
    assert audiohash64(encode_envelope_wav16(bits, 32)) == audiohash64(
        encode_envelope_wav16(bits, 96)
    )
    from ensembl_database_loader_spark.multimodal.binaryops import (
        encode_wav16,
    )

    with pytest.raises(ValueError, match="too short"):
        audiohash64(encode_wav16(32, 100))
    with pytest.raises(ValueError, match="flip_windows"):
        build_envelope_media(ids, "doc_id", flip_windows=0).collect()
