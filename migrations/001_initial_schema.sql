-- crawlspark initial schema (S11). Analog of the reference's
-- migrations/001_initial_schema.sql (PostgreSQL): entity + job + rate-limit
-- tables become the crawl-domain tables of FIXTURES.md. Offline these land
-- in the session catalog as parquet tables; on a cluster the same runner
-- executes them as `USING iceberg PARTITIONED BY (bucket(N, host_hash))`.

CREATE TABLE IF NOT EXISTS crawl_frontier (
  url STRING,
  url_hash BIGINT,
  host STRING,
  host_hash BIGINT,
  priority INT,
  seq BIGINT,
  image_id STRING,
  attempt INT,
  not_before_epoch INT,
  discovered_at TIMESTAMP
) USING parquet;

CREATE TABLE IF NOT EXISTS url_seen (
  url_hash BIGINT,
  host_hash BIGINT,
  first_seen_epoch INT,
  first_seen_priority INT
) USING parquet;

CREATE TABLE IF NOT EXISTS crawl_log (
  epoch INT,
  admission_idx BIGINT,
  url_hash BIGINT,
  url STRING,
  host STRING,
  image_id STRING,
  status STRING,
  attempt INT,
  psnr_db DOUBLE,
  caption_ok BOOLEAN,
  phash_ok BOOLEAN,
  fetched_at TIMESTAMP
) USING parquet;

-- job ledger: reference crawl_jobs (status/cursor/counters/metadata)
CREATE TABLE IF NOT EXISTS crawl_jobs (
  job_id BIGINT,
  epoch BIGINT,
  status STRING,
  records_processed BIGINT,
  records_created BIGINT,
  records_updated BIGINT,
  input_files STRING,
  error_message STRING
) USING parquet;

-- politeness state: reference rate_limit_status + token-bucket fields
CREATE TABLE IF NOT EXISTS politeness_budget (
  host STRING,
  capacity INT,
  refill_per_epoch INT,
  tokens INT,
  backoff_until_epoch INT
) USING parquet;

CREATE TABLE IF NOT EXISTS robots (
  host STRING,
  disallow_prefixes ARRAY<STRING>,
  crawl_delay_ms INT
) USING parquet;
