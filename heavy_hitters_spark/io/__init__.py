from .pages import extract_text_col, pages_df, synthesize_pages

__all__ = ["pages_df", "extract_text_col", "synthesize_pages"]
