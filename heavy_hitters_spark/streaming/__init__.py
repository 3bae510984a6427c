from .sketch_stream import merged_sketch, sketch_sink, windowed_sketch_sink

__all__ = ["sketch_sink", "windowed_sketch_sink", "merged_sketch"]
