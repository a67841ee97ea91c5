"""ospo_ghcrawler_spark — a from-scratch PySpark-native crawl/analytics engine.

Re-expresses the data-processing capabilities of the reference repo
``lodexinc/ospo-ghcrawler`` (a GitHub-API crawler service) as a batch-iterative
URL-frontier + fetch scheduler over snapshot tables of Common-Crawl-style web
pages, built entirely on the ``pyspark.sql`` DataFrame API plus vectorized
pandas/Arrow UDFs.

Architecture (Spark-first, NOT a port):

- the reference's mutable priority queues (events/immediate/soon/normal/later,
  /root/reference/lib/crawlerFactory.js:573-580) become one partitioned
  ``frontier`` table with a ``priority`` column; "pop" is a deterministic
  window-ranked selection per superstep;
- its Redis seen-set / tracker (/root/reference/providers/queuing/
  redisRequestTracker.js:17-41) becomes a persistent ``seen`` table guarded by
  a partitioned bloom(+cuckoo) filter family keyed on xxhash64(url);
- its per-token rate limits (/root/reference/providers/fetcher/
  limitedTokenFactory.js:19-42) become per-host windowed politeness budgets
  enforced inside the selection window-rank;
- its blob doc-store + hourly delta log (/root/reference/providers/storage/
  storageDocStore.js, deltaStore.js) become append-only snapshot commits of a
  ``pages`` table — one snapshot per superstep, exactly resumable.
"""

__version__ = "0.1.0"

from ospo_ghcrawler_spark.config import CrawlConfig  # noqa: F401
