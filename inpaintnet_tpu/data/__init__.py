from inpaintnet_tpu.data.score import Note, Pitch, Score
from inpaintnet_tpu.data.abc_parser import parse_abc, AbcParseError
from inpaintnet_tpu.data.tokenizer import (
    SLUR_SYMBOL,
    START_SYMBOL,
    END_SYMBOL,
    OUT_OF_RANGE,
    PAD_SYMBOL,
    REST,
    SUBDIVISION,
    TICK_VALUES,
    TICK_DURATIONS,
    Vocabulary,
    score_to_tensor,
    tensor_to_score,
    all_transposition_semitones,
)
from inpaintnet_tpu.data.metadata import (
    Metadata,
    TickMetadata,
    BeatMarkerMetadata,
    IsPlayingMetadata,
    metadata_tensor,
)
from inpaintnet_tpu.data.corpus import FolkCorpus, split_raw_dump
from inpaintnet_tpu.data.dataset import (
    MusicDataset,
    FolkDataset,
    FolkMeasuresDataset,
    FolkMeasuresDatasetTranspose,
    FolkDatasetNBars,
    BatchIterator,
)
from inpaintnet_tpu.data.registry import DatasetManager, ALL_DATASETS
