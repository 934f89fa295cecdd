"""Assembly goldens: dedup keep-latest, numeric sort, HTML render, unions."""

from ocracle_ray.core.assemble import (
    assemble_tasks,
    dedup_keep_latest,
    exam_version_abbr,
    ordered_union,
    render_task_html,
    sorted_union,
    task_sort_key,
)


def test_numeric_aware_sort_key():
    # object_handling.py:241-246: (first int, str); no int -> +inf
    nums = ["10", "2", "1a", "1b", "x", "3"]
    out = sorted(nums, key=task_sort_key)
    assert out == ["1a", "1b", "2", "3", "10", "x"]


def test_dedup_keeps_latest():
    tasks = [
        {"task_number": "1", "points": 1},
        {"task_number": "2", "points": 2},
        {"task_number": "1", "points": 9},  # later write wins
    ]
    out = dedup_keep_latest(tasks)
    assert [(t["task_number"], t["points"]) for t in out] == [("2", 2), ("1", 9)]


def test_assemble_dedup_then_sort():
    tasks = [
        {"task_number": "3"},
        {"task_number": "1", "v": "old"},
        {"task_number": "1", "v": "new"},
        {"task_number": "10"},
    ]
    out = assemble_tasks(tasks)
    assert [t["task_number"] for t in out] == ["1", "3", "10"]
    assert out[0]["v"] == "new"


def test_exam_version_abbr():
    assert exam_version_abbr("Vår 2023") == "V23"
    assert exam_version_abbr("Høst 2024") == "H24"
    assert exam_version_abbr("kont 2024") == "K24"
    assert exam_version_abbr("2023") == "2023"


def test_render_task_html_snapshot():
    html = render_task_html("1", "Linje en\nVi har x her", [(9, 17, "x = 1")])
    assert html == "<h3>Oppgave 1</h3><p>Linje en</p><p>$x = 1$ her</p>"


def test_render_escapes():
    assert render_task_html("", "a < b & c", []) == "<p>a &lt; b &amp; c</p>"


def test_ordered_union():
    assert ordered_union([["a", "b"], ["b", "c"], ["a", "d"]]) == ["a", "b", "c", "d"]


def test_sorted_union():
    assert sorted_union([["tma4100", " TDT4110 "], ["ifyx1000"]], drop="TMA4100") == [
        "IFYX1000",
        "TDT4110",
    ]
