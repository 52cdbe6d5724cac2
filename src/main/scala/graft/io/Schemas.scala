package graft.io

import java.sql.Timestamp

/** Canonical row types (FIXTURES.md §B/§C; BASELINE input_hint). */

/** One transcript turn — the engine's primary input row. */
case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,      // user | assistant | tool
    text: String,
    tool: String,      // "" unless role == "tool"
    ts: Timestamp)

/** One extracted (subj, pred, obj) triple, tagged with provenance. */
case class Triple(
    conv_id: String,
    turn_idx: Int,
    subj: String,
    pred: String,
    obj: String)

/** Hashed edge — lodcc edgelist row (`edgelist.py:79-83`). */
case class Edge(src: String, dst: String, label: String)

/** Vertex dictionary: hash -> surface form (replaces lodcc's bfv reverse scan). */
case class Vertex(vhash: String, surface: String)

/** Long-format measure row (mirrors stats_graph_2017_08 columns). */
case class Measure(dataset: String, measure: String, value: Double)

/** Per-partition lineage row committed with every TableIO snapshot. */
case class Lineage(
    stage: String,
    partition_id: Int,
    input_snapshot: String,
    row_count: Long,
    wall_ms: Long)
