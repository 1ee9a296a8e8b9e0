from .tracker import (KLTChangeTCPyramid, KLTCountRemainingFeatures,
                      KLTCreateFeatureList, KLTCreateFeatureTable,
                      KLTCreateTrackingContext, KLTExtractFeatureList,
                      KLTPrintTrackingContext, KLTReplaceLostFeatures,
                      KLTSelectGoodFeatures, KLTStoreFeatureList,
                      KLTTrackFeatures, KLTUpdateTCBorder, Tracker)
from .sequence import SequenceTracker, track_sequence
from .chunked import track_sequence_chunked

__all__ = [
    "KLTChangeTCPyramid", "KLTCountRemainingFeatures",
    "KLTCreateFeatureList", "KLTCreateFeatureTable",
    "KLTCreateTrackingContext", "KLTExtractFeatureList",
    "KLTPrintTrackingContext", "KLTReplaceLostFeatures",
    "KLTSelectGoodFeatures", "KLTStoreFeatureList", "KLTTrackFeatures",
    "KLTUpdateTCBorder", "Tracker", "SequenceTracker", "track_sequence",
    "track_sequence_chunked",
]
