"""Multi-chip scaling: EC-axis device meshes and distributed init."""
