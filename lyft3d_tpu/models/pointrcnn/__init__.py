"""PointRCNN two-stage point-cloud detector (flax)."""
