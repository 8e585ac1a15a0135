from .kmers import canonical_kmers_device, encode_bases_device
from .hashing import murmur32_device, slice_indices_device
from .transpose import transpose_bits_device, pack_filters_to_words
from .search import (
    db_bytes_to_words,
    search_counts,
    search_complete,
    make_query_batch,
)
