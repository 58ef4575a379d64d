from websearchengine_spark.functions.porter import porter_step1
from websearchengine_spark.functions.analyze import analyze_text, analyze_query_word
from websearchengine_spark.functions.codec import (
    varbyte_encode,
    varbyte_decode,
    encode_posting_blocks,
    decode_posting_blocks,
)
from websearchengine_spark.functions.extract import extract_text_and_title

__all__ = [
    "porter_step1",
    "analyze_text",
    "analyze_query_word",
    "varbyte_encode",
    "varbyte_decode",
    "encode_posting_blocks",
    "decode_posting_blocks",
    "extract_text_and_title",
]
