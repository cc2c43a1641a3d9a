from .text_tokenizer import (
    generate_coord_tokens,
    generate_object_class_tokens,
    generate_sentinel_tokens,
    get_sentinel_to_id_mapping,
    load_tokenizer,
    merge_span_masking,
    split_by_sentinel,
    train_unified_wordpiece_tokenizer,
)
