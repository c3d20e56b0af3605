"""Per-batch transform dataflow (reference EP1 step 5 re-expressed as pure
DataFrame functions) plus sinks and the reorg protocol."""
