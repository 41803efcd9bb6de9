"""Part-semantic vocabulary and project geometry constants.

The 42-class PartNet-chair leaf-semantic vocabulary used for the semantic
embedding (reference ``engine/global_variables.py:44``; embedding consumer
``engine/train.py:48``).  The ids must match the reference exactly so
checkpoints / pseudo-label tables interoperate.  Unlike the reference's
hard-coded ``/mnt/d/...`` path globals, all paths here come from the config.
"""

from __future__ import annotations

NUM_SEMANTIC_CLASSES = 42

# PartNet chair leaf-label -> embedding id (reference vocabulary, data not
# code: these pairs define the checkpoint-compatible embedding rows).
LABEL_TO_IDX = {
    "back_surface_vertical_bar": 0,
    "arm_near_vertical_bar": 1,
    "back_connector": 2,
    "back_support": 3,
    "arm_holistic_frame": 4,
    "back_holistic_frame": 5,
    "back_frame": 6,
    "back_single_surface": 7,
    "seat_surface_bar": 8,
    "chair_base": 9,
    "leg": 10,
    "seat_frame_bar": 11,
    "head_connector": 12,
    "chair_arm": 13,
    "bar_stretcher": 14,
    "seat_surface": 15,
    "seat_holistic_frame": 16,
    "chair_head": 17,
    "arm_sofa_style": 18,
    "seat_single_surface": 19,
    "regular_leg_base": 20,
    "lever": 21,
    "back_frame_vertical_bar": 22,
    "arm_horizontal_bar": 23,
    "arm_connector": 24,
    "rocker": 25,
    "foot": 26,
    "back_surface": 27,
    "arm_writing_table": 28,
    "wheel": 29,
    "caster_stem": 30,
    "back_surface_horizontal_bar": 31,
    "central_support": 32,
    "back_frame_horizontal_bar": 33,
    "seat_support": 34,
    "star_leg_set": 35,
    "seat_frame": 36,
    "runner": 37,
    "headrest": 38,
    "pedestal": 39,
    "footrest": 40,
    "foot_base": 41,
}

IDX_TO_LABEL = {v: k for k, v in LABEL_TO_IDX.items()}

# Coarse chair-region map (reference ``global_variables.py:38``)
SEM_MAP = {
    "chair_base": "0",
    "chair_seat": "1",
    "chair_back": "2",
    "chair_arm": "3",
    "footrest": "9",
    "chair_head": "9",
}

# Geometry constants (reference ``global_variables.py:32-35,42``)
ZERO_TOL = 1.0e-6
MIN_NUM_PARTS = 4
MAX_NUM_PARTS = 16
NUM_SAMPLE_POINTS = 2048
ADJACENCY_TOL = 5.0e-2


def label_id(label: str, strict: bool = False) -> int:
    """Leaf-path label (``a/b/c``) -> embedding id of its last segment.

    Unknown labels (non-PartNet corpora, mid-level labels) raise under
    ``strict``; otherwise they hash deterministically into the 42-id space
    so custom datasets work without editing the vocabulary.
    """
    leaf = label.split("/")[-1]
    if leaf in LABEL_TO_IDX:
        return LABEL_TO_IDX[leaf]
    if strict:
        raise KeyError(f"unknown part label '{leaf}'")
    import zlib

    return zlib.crc32(leaf.encode()) % NUM_SEMANTIC_CLASSES
