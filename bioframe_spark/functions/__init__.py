from .intervals import (
    effective_end,
    overlap_predicate,
    overlap_length,
    genomic_distance,
    natsort_key,
)
