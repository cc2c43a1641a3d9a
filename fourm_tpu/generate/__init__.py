from .init_helpers import (
    custom_text,
    empty_img_modality,
    empty_seq_emb_modality,
    empty_seq_modality,
    expand_to_batch,
    init_empty_target_modality,
    init_full_input_modality,
)
from .sampler import GenerationSampler
from .schedules import (
    build_chained_generation_schedules,
    continue_token_schedule,
    cosine_token_schedule,
    linear_temp_schedule,
    linear_token_schedule,
    onex_temp_schedule,
)
