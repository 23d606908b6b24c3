from fots.data.annotations import load_annotation  # noqa: F401
from fots.data.detection import detection_batches, detection_generator  # noqa: F401
from fots.data.ocr_crops import ocr_crop_batches, ocr_crop_generator  # noqa: F401
