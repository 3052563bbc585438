"""burst_intervals (frequency.py) — hand-computed windowed burst runs."""

import pyarrow as pa


def _docs(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "warc_ts": pa.array(
                    [r[0] * 1_000_000 for r in rows], pa.int64()
                ),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    ).repartition(3)


def test_burst_intervals_hand_case(ray_session):
    from textalyzer_ray.pipelines.frequency import burst_intervals

    rows = []
    # filler pins W = 6 distinct windows; 'aaa' never bursts (1*6 < 2*6)
    for w in range(6):
        rows.append((w * 60, "aaa"))
    # 'zzz': counts [6,6,1,1,1,1], total 16 -> burst iff c*6 > 2*16;
    # windows 0,60 qualify (36 > 32), the rest don't (6 < 32)
    for w, c in ((0, 6), (60, 6), (120, 1), (180, 1), (240, 1), (300, 1)):
        rows.append((w, " ".join(["zzz"] * c)))
    # 'bbb': one huge window -> island of length 1, dropped by
    # min_windows=2
    rows.append((120, " ".join(["bbb"] * 12)))

    out = burst_intervals(
        _docs(rows), window_s=60, min_windows=2, lift_num=2, lift_den=1
    ).take_all()
    assert out == [
        {
            "word": "zzz",
            "burst_start": 0,
            "burst_end": 60,
            "n_windows": 2,
            "burst_count": 12,
            "peak_count": 6,
        }
    ]


def test_burst_intervals_consecutiveness(ray_session):
    """A gap between qualifying windows splits the run: [hot, cold,
    hot] yields two length-1 islands, both dropped at min_windows=2,
    but kept at min_windows=1 as separate intervals."""
    from textalyzer_ray.pipelines.frequency import burst_intervals

    rows = [(w * 60, "pad") for w in range(4)]
    # 'qqq' counts [8,1,8,1], total 18; c*4 > 2*18 -> c > 9?? no:
    # 8*4=32 < 36 -> use lift 3/2: c*4*2 > 3*18=54 -> c*8 > 54 -> c >= 7
    for w, c in ((0, 8), (60, 1), (120, 8), (180, 1)):
        rows.append((w, " ".join(["qqq"] * c)))

    strict = burst_intervals(
        _docs(rows), window_s=60, min_windows=2, lift_num=3, lift_den=2
    ).take_all()
    assert [r for r in strict if r["word"] == "qqq"] == []

    loose = burst_intervals(
        _docs(rows), window_s=60, min_windows=1, lift_num=3, lift_den=2
    ).take_all()
    qq = [r for r in loose if r["word"] == "qqq"]
    assert [(r["burst_start"], r["burst_end"], r["n_windows"]) for r in qq] == [
        (0, 0, 1),
        (120, 120, 1),
    ]
