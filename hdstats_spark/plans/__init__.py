"""End-to-end tiering plans: checkpointed raw→1m→1h→1d materialization."""
