from crawlspark.sources.tables import CommitLog, EpochTable  # noqa: F401
