"""CLI surface: init → append (suppression) → query → delete, in-process
(the CLI reuses the session's Ray; subprocess startup is covered by the
drive recipe)."""

import json


def test_cli_roundtrip(ray_session, tmp_path, capsys):
    from rdf_diff_store_ray.__main__ import main

    store = str(tmp_path / "deltas")
    text = '<https://x/a> <https://x/p> "1" .\n'

    assert main(["init", "--store", store, "--partitions", "4"]) == 0
    assert main(["append", "--store", store, "--graph", "https://x/g",
                 "--text", text, "--ts", "1700000000"]) == 0
    assert main(["append", "--store", store, "--graph", "https://x/g",
                 "--text", text, "--ts", "1700000050"]) == 0
    assert main(["metadata", "--store", store]) == 0
    assert main(["query", "--store", store, "--ts", "1700000100",
                 "--bgp", "?s <https://x/p> ?o"]) == 0
    assert main(["delete", "--store", store, "--graph", "https://x/g",
                 "--ts", "1700000200"]) == 0
    assert main(["graphs-at", "--store", store, "--ts", "1700000300"]) == 0

    lines = capsys.readouterr().out.strip().splitlines()
    assert json.loads(lines[1]) == {"applied": 1, "suppressed": False}
    assert json.loads(lines[2]) == {"applied": 0, "suppressed": True}
    assert json.loads(lines[3]) == {"start_time": 1700000000,
                                    "end_time": 1700000000}
    q = json.loads(lines[4])
    assert q["results"]["bindings"] == [
        {"o": {"value": "1"}, "s": {"value": "https://x/a"}}
    ]
    assert json.loads(lines[5]) == {"applied": 1}
    # graphs-at after delete prints the empty document (no trailing line)
    assert lines[5] == lines[-1]


def test_cli_diff(ray_session, tmp_path, capsys):
    from rdf_diff_store_ray.__main__ import main

    store = str(tmp_path / "deltas")
    v1 = '<https://x/a> <https://x/p> "1" .\n'
    v2 = ('<https://x/a> <https://x/p> "2" .\n'
          '<https://x/b> <https://x/p> "3" .\n')
    assert main(["init", "--store", store, "--partitions", "2"]) == 0
    assert main(["append", "--store", store, "--graph", "g",
                 "--text", v1, "--ts", "1700000000"]) == 0
    assert main(["append", "--store", store, "--graph", "g",
                 "--text", v2, "--ts", "1700000100"]) == 0
    capsys.readouterr()
    assert main(["diff", "--store", store, "--ts1", "1700000050",
                 "--ts2", "1700000200"]) == 0
    rows = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    assert {(r["change"], r["line"]) for r in rows} == {
        ("added", '<https://x/a> <https://x/p> "2" .'),
        ("added", '<https://x/b> <https://x/p> "3" .'),
        ("removed", '<https://x/a> <https://x/p> "1" .'),
    }


def test_cli_graphs_at_out_and_turtle(ray_session, tmp_path, capsys):
    from rdf_diff_store_ray.__main__ import main

    store = str(tmp_path / "deltas")
    text = ('<https://d/a> <https://d/p> "1" .\n'
            '<https://d/b> <https://d/q> <https://d/a> .\n')
    assert main(["init", "--store", store, "--partitions", "4"]) == 0
    assert main(["append", "--store", store, "--graph", "g",
                 "--text", text, "--ts", "1700000000"]) == 0
    capsys.readouterr()

    # prettified Turtle export with a prefix mapping
    assert main(["graphs-at", "--store", store, "--ts", "1700000100",
                 "--turtle", "--prefix", "d=https://d/"]) == 0
    ttl = capsys.readouterr().out
    assert "@prefix d: <https://d/> ." in ttl and "d:a d:p" in ttl
    from rdf_diff_store_ray.turtle import turtle_to_canonical

    assert turtle_to_canonical(ttl) == text

    # streamed --out path equals the in-memory document
    out = tmp_path / "merged.nt"
    assert main(["graphs-at", "--store", store, "--ts", "1700000100",
                 "--out", str(out)]) == 0
    info = __import__("json").loads(capsys.readouterr().out)
    assert info["lines"] == 2
    assert out.read_text() == text
