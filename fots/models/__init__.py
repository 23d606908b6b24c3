from fots.models.detector import FOTSDetector, RecognitionHead  # noqa: F401
from fots.models.crnn import CRNN  # noqa: F401
