"""Unified WordPiece text tokenizer utilities.

Equivalent of reference fourm/utils/tokenizer/text_tokenizer.py: builds/loads the
shared 30k WordPiece tokenizer used by every sequence modality, with
  * 100 span-masking sentinel tokens  [S_0] .. [S_99]
  * 4 x `bins` coordinate tokens      v0=0 .. v3=999 (bboxes, poses, palettes, metadata)
  * object class name tokens          (COCO-80 by default)
plus span-merging helpers used at generation time. The trained tokenizer JSON from
the reference release loads directly via `tokenizers.Tokenizer.from_file` — text
tokenization is pure host-side CPU work shared between frameworks.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Union

from tokenizers import AddedToken, Tokenizer, decoders, trainers
from tokenizers.models import WordPiece
from tokenizers.normalizers import BertNormalizer
from tokenizers.pre_tokenizers import BertPreTokenizer

# Standard COCO-80 detection class names (alphabetical), the default object-class
# token set (reference object_classes.json "coco").
COCO_CLASSES = [
    "airplane", "apple", "backpack", "banana", "baseball bat", "baseball glove",
    "bear", "bed", "bench", "bicycle", "bird", "boat", "book", "bottle", "bowl",
    "broccoli", "bus", "cake", "car", "carrot", "cat", "cell phone", "chair",
    "clock", "couch", "cow", "cup", "dining table", "dog", "donut", "elephant",
    "fire hydrant", "fork", "frisbee", "giraffe", "hair drier", "handbag", "horse",
    "hot dog", "keyboard", "kite", "knife", "laptop", "microwave", "motorcycle",
    "mouse", "orange", "oven", "parking meter", "person", "pizza", "potted plant",
    "refrigerator", "remote", "sandwich", "scissors", "sheep", "sink", "skateboard",
    "skis", "snowboard", "spoon", "sports ball", "stop sign", "suitcase",
    "surfboard", "teddy bear", "tennis racket", "tie", "toaster", "toilet",
    "toothbrush", "traffic light", "train", "truck", "tv", "umbrella", "vase",
    "wine glass", "zebra",
]


def generate_sentinel_tokens(num: int = 100, start_id: int = 0) -> List[AddedToken]:
    return [
        AddedToken(content=f"[S_{i}]", single_word=True, normalized=False)
        for i in range(start_id, num + start_id)
    ]


def generate_coord_tokens(bins: int = 1000) -> List[AddedToken]:
    """Coordinate value tokens v0=..v3= used by det/pose/palette/metadata."""
    tokens = []
    for s in ("v0={}", "v1={}", "v2={}", "v3={}"):
        for i in range(bins):
            tokens.append(AddedToken(content=s.format(i), single_word=True, normalized=False))
    return tokens


def generate_object_class_tokens(classes: Optional[Sequence[str]] = None) -> List[AddedToken]:
    classes = classes if classes is not None else COCO_CLASSES
    return [AddedToken(content=c, single_word=True, normalized=True) for c in classes]


def train_unified_wordpiece_tokenizer(
    files: Union[str, List[str]],
    vocab_size: int,
    sentinel_tokens: Optional[List] = None,
    coord_tokens: Optional[List] = None,
    object_class_tokens: Optional[List] = None,
    unk_token: str = "[UNK]",
    pad_token: str = "[PAD]",
    sos_token: str = "[SOS]",
    eos_token: str = "[EOS]",
    additional_special_tokens: Optional[List] = None,
    min_frequency: int = 0,
    lowercase: bool = True,
    wordpieces_prefix: str = "##",
    show_progress: bool = True,
) -> Tokenizer:
    """Train the shared WordPiece tokenizer (reference text_tokenizer.py:47-105).

    Special token order is load-bearing: [PAD]=0, [UNK]=1, [SOS]=2, [EOS]=3, then
    sentinels, coords, object classes.
    """
    tokenizer = Tokenizer(WordPiece(unk_token=str(unk_token)))
    tokenizer.normalizer = BertNormalizer(
        clean_text=True, handle_chinese_chars=True, strip_accents=None, lowercase=lowercase
    )
    tokenizer.pre_tokenizer = BertPreTokenizer()
    tokenizer.decoder = decoders.WordPiece(prefix=wordpieces_prefix)

    special_tokens = [pad_token, unk_token, sos_token, eos_token]
    for extra in (sentinel_tokens, coord_tokens, object_class_tokens, additional_special_tokens):
        if extra is not None:
            special_tokens.extend(extra)

    trainer = trainers.WordPieceTrainer(
        vocab_size=vocab_size,
        min_frequency=min_frequency,
        show_progress=show_progress,
        continuing_subword_prefix=wordpieces_prefix,
        special_tokens=special_tokens,
    )
    if isinstance(files, str):
        files = [files]
    tokenizer.train(files, trainer=trainer)
    return tokenizer


def load_tokenizer(path: str) -> Tokenizer:
    """Load a trained tokenizer JSON (compatible with the reference release artifact
    fourm/utils/tokenizer/trained/text_tokenizer_4m_wordpiece_30k.json)."""
    return Tokenizer.from_file(path)


def get_sentinel_to_id_mapping(tokenizer: Tokenizer, match_str: str = "[S_") -> Dict[int, int]:
    """Map sentinel number -> vocab id (reference text_tokenizer.py:108-112)."""
    sentinel_tokens = {k: v for k, v in tokenizer.get_vocab().items() if k.startswith(match_str)}
    return {
        int(k.split("_")[1][:-1]): v
        for k, v in sorted(sentinel_tokens.items(), key=lambda x: x[1])
    }


def split_by_sentinel(seq_ids: List[int], sentinel_ids) -> Dict[int, List[int]]:
    splits = defaultdict(list)
    cur = None
    for token in seq_ids:
        if token in sentinel_ids:
            cur = token
        else:
            splits[cur].append(token)
    return splits


def merge_span_masking(input_seq: List[int], decoder_seq: List[int], sentinel_ids) -> List[int]:
    """Splice decoder-generated span contents back into the sentinel slots of the
    input sequence (reference text_tokenizer.py:127-135)."""
    decoder_splits = split_by_sentinel(decoder_seq, sentinel_ids)
    out = []
    for token in input_seq:
        if token in sentinel_ids:
            out.extend(decoder_splits[token])
        else:
            out.append(token)
    return out
