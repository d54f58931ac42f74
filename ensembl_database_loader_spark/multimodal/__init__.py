from ensembl_database_loader_spark.multimodal.binaryops import (
    decode_media_stats,
    with_binary_payload,
)

__all__ = ["with_binary_payload", "decode_media_stats"]
