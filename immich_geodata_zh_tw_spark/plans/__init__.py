"""End-to-end query plans composed from the engine's operators."""
