"""Host-side input pipelines (reference layer L5b).

Three dataset families, same as the reference: DSEC (flow), EVIMO2 and
MultiFlow (trajectory).  Host code is pure NumPy + h5py: it slices raw event
windows and emits fixed-capacity batches; voxelization runs *on device*
inside the jitted step (motionpriorcmax_tpu.ops.events) — unlike the
reference, which voxelizes on CPU dataloader workers (SURVEY.md §3.1 hot
loop (e)).
"""

from .keys import DataSetType, BatchKeys
from .collate import pad_events, collate_fixed_capacity
from .dsec import DsecSequence, DsecDatasetProvider, TRAIN_SEQS, VAL_SEQS
from .evimo2 import Evimo2Datasubset, Evimo2Provider
from .multiflow import MultiflowDatasubset, MultiflowProvider, MultiflowSample
from .augment import (SpatialAugmentor, PhotometricAugmentor,
                      MultiflowAugmentor)

__all__ = [
    "SpatialAugmentor",
    "PhotometricAugmentor",
    "MultiflowAugmentor",
    "DataSetType",
    "BatchKeys",
    "pad_events",
    "collate_fixed_capacity",
    "DsecSequence",
    "DsecDatasetProvider",
    "TRAIN_SEQS",
    "VAL_SEQS",
    "Evimo2Datasubset",
    "Evimo2Provider",
    "MultiflowDatasubset",
    "MultiflowProvider",
    "MultiflowSample",
]
