"""Custom data sources.

wikidump: MediaWiki XML export reader (the reference's
StreamWikiDumpInputFormat re-imagined as a Spark 4 Python DataSource).
"""

from .wikidump import WikidumpDataSource, register_wikidump, read_wikidump

__all__ = ["WikidumpDataSource", "register_wikidump", "read_wikidump"]
