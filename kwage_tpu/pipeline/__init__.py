from .make_bloom import (
    BuildOptions,
    counting_filter_log2_len,
    build_bloom_device,
    build_bloom_from_sequences,
    build_bloom_from_file,
)
from .build_db import (
    build_db_from_bloom_files,
    build_dbz_from_bloom_files,
    transpose_filters,
)
