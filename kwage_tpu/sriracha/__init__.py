from .engine import (
    SearchMatch,
    SrirachaOptions,
    assign_read_range,
    extract_sra_accession,
    search_accession,
    search_reads,
)
