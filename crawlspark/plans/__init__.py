from crawlspark.plans.state import CrawlState  # noqa: F401
from crawlspark.plans.epoch import web_crawl, catalog_crawl  # noqa: F401
