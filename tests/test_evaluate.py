"""E2E and OCR evaluation metric tests."""

import numpy as np

from fots.evaluate import E2EMetrics, evaluate_image
from fots.ocr_eval import OCRMetrics, script_of


def _det(x0, y0, x1, y1, text):
    quad = np.array([x0, y0, x1, y0, x1, y1, x0, y1], np.float64)
    return (quad, text)


def test_evaluate_image_perfect_match():
    gt = np.array([[10, 10, 100, 10, 100, 40, 10, 40]])
    dets = [_det(10, 10, 100, 40, "HELLO")]
    tp, tp_e2e, gt_e2e, tp_ed1, d2g, _dc = evaluate_image(dets, gt, ["HELLO"])
    assert (tp, tp_e2e, gt_e2e, tp_ed1) == (1, 1, 1, 1)
    assert d2g[0][0] == 0


def test_evaluate_image_edit_distance_one():
    gt = np.array([[10, 10, 100, 10, 100, 40, 10, 40]])
    dets = [_det(10, 10, 100, 40, "HELLN")]
    tp, tp_e2e, gt_e2e, tp_ed1, _, _dc = evaluate_image(dets, gt, ["HELLO"])
    assert (tp, tp_e2e, tp_ed1) == (1, 0, 1)


def test_evaluate_image_short_gt_excluded():
    gt = np.array([[10, 10, 100, 10, 100, 40, 10, 40]])
    dets = [_det(10, 10, 100, 40, "AB")]
    tp, tp_e2e, gt_e2e, _, _, _dc = evaluate_image(dets, gt, ["AB"])
    assert gt_e2e == 0 and tp == 0  # len < 3 ignored


def test_evaluate_image_iou_below_threshold():
    gt = np.array([[10, 10, 100, 10, 100, 40, 10, 40]])
    dets = [_det(200, 200, 280, 240, "HELLO")]
    tp, tp_e2e, gt_e2e, _, d2g, _dc = evaluate_image(dets, gt, ["HELLO"])
    assert (tp, tp_e2e) == (0, 0)
    assert d2g == {}


def test_running_metrics_hmean():
    m = E2EMetrics()
    gt = np.array([[10, 10, 100, 10, 100, 40, 10, 40]])
    m.add_image([_det(10, 10, 100, 40, "HELLO")], gt, ["HELLO"])
    m.add_image([_det(10, 10, 100, 40, "WRONG")], gt, ["HELLO"])
    s = m.summary()
    assert s["detection_recall"] == 1.0
    assert s["e2e_recall"] == 0.5
    assert 0 < s["e2e_hmean"] < 1


def test_ocr_metrics():
    m = OCRMetrics()
    m.add("HELLO", "HELLO")
    m.add("HELLN", "HELLO")
    m.add("مرحبا", "مرحبا")
    s = m.summary()
    assert s["accuracy"] == 2 / 3
    assert s["edit_distance"] == 1
    assert s["per_script"]["Latin"]["total"] == 2
    assert s["per_script"]["Arabic"]["accuracy"] == 1.0
    assert m.worst_cases()[0][0] == 1


def test_script_of():
    assert script_of("hello") == "Latin"
    assert script_of("你好") == "CJK"
    assert script_of("مرحبا") == "Arabic"
    assert script_of("123") == "Digit"
    assert script_of("!!!") == "Other"


def test_ocr_confusion_matrix(tmp_path):
    """Script confusion matrix (reference ocr_test_utils.py:54,197):
    rows gt script, cols predicted script."""
    from fots.ocr_eval import OCRMetrics

    m = OCRMetrics()
    m.add("hello", "hello")       # Latin -> Latin
    m.add("123", "world")         # Latin gt, Digit pred
    m.add("42", "42")             # Digit -> Digit
    scripts, cm = m.confusion_matrix()
    assert scripts == ["Digit", "Latin"]
    assert cm[scripts.index("Latin")][scripts.index("Latin")] == 1
    assert cm[scripts.index("Latin")][scripts.index("Digit")] == 1
    assert cm[scripts.index("Digit")][scripts.index("Digit")] == 1
    p = tmp_path / "ocr.csv"
    m.to_csv(str(p))
    text = p.read_text()
    assert "confusion_gt\\pred" in text and "Digit" in text


def test_ocr_html_report(tmp_path):
    """HTML worst-case report (reference ocr_test_utils.py:228-294)."""
    from fots.ocr_eval import OCRMetrics

    m = OCRMetrics()
    m.add("HELLO", "HELLO")
    m.add("HELP", "HELLO")
    m.add("<bad&>", "safe")
    p = tmp_path / "report.html"
    m.to_html(str(p), images={"HELLO": "crop0.png"})
    text = p.read_text()
    assert "Worst predictions" in text
    assert "HELP" in text and "crop0.png" in text
    assert "&lt;bad&amp;&gt;" in text  # escaped
    assert "accuracy" in text


def test_dontcare_detection_excluded_from_precision():
    """A detection on a ### region: counted against precision by default
    (reference eval.py:715), excluded under ignore_dontcare=True."""
    gt = np.array([[0, 0, 100, 0, 100, 30, 0, 30],
                   [200, 0, 300, 0, 300, 30, 200, 30]], np.float32)
    txts = ["HELLO", "###"]
    dets = [(np.array([0, 0, 100, 0, 100, 30, 0, 30, 0.9]), "HELLO"),
            (np.array([200, 0, 300, 0, 300, 30, 200, 30, 0.8]), "JUNK")]
    *_, n_dc = evaluate_image(dets, gt, txts)
    assert n_dc == 1
    ref = E2EMetrics()
    ref.add_image(dets, gt, txts)
    assert ref.summary()["e2e_precision"] == 0.5
    icdar = E2EMetrics(ignore_dontcare=True)
    icdar.add_image(dets, gt, txts)
    assert icdar.summary()["e2e_precision"] == 1.0
