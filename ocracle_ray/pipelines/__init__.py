"""End-to-end Dataset pipelines + resumable checkpoint manifests."""
