from pixelpick_tpu.active.codec import (
    encode_query,
    decode_query,
    decode_queries,
    gather_previous_query_files,
    merge_previous_query_files,
)
