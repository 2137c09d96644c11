"""spark-submit primary resource for the crawl CLI (north_rule: the
job runs via ``spark-submit --py-files`` on a cluster).

    zip -r nc_spark.zip node_crawler_spark        # or tests' build_pyfiles_zip
    spark-submit --master <cluster> --py-files nc_spark.zip \\
        scripts/submit_crawl.py \\
        --seeds http://www.site.test/ \\
        --pages /data/pages_parquet --http-meta /data/http_meta_parquet \\
        --store /data/crawl_store --exclude '\\.pdf$' --retries 1

spark-submit cannot run ``-m package.module`` directly, so this thin
launcher is the submittable file; everything real lives in the package
shipped through ``--py-files`` (tests/test_spark_submit.py proves the
import resolves from the zip, not the repo checkout).
"""

import sys

from node_crawler_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
