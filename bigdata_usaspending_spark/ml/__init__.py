"""MLlib pipelines mirroring the reference's training/inference surface."""
