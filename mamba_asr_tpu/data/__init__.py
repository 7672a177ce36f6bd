"""Host-side input pipeline: manifests, tokenizers, bucketing, augment."""
