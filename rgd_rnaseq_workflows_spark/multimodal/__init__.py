"""Multimodal (image/audio/video) binary-column plumbing."""
