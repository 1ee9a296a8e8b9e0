from .tracker import (KLTCountRemainingFeatures, KLTCreateFeatureList,
                      KLTCreateFeatureTable, KLTCreateTrackingContext,
                      KLTExtractFeatureList, KLTReplaceLostFeatures,
                      KLTSelectGoodFeatures, KLTStoreFeatureList,
                      KLTTrackFeatures, Tracker)
from .sequence import SequenceTracker, track_sequence

__all__ = [
    "KLTCountRemainingFeatures", "KLTCreateFeatureList",
    "KLTCreateFeatureTable", "KLTCreateTrackingContext",
    "KLTExtractFeatureList", "KLTReplaceLostFeatures",
    "KLTSelectGoodFeatures", "KLTStoreFeatureList", "KLTTrackFeatures",
    "Tracker", "SequenceTracker", "track_sequence",
]
