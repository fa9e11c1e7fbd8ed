/**
 * velesdb-tpu TypeScript SDK — REST client + fluent VelesQL builder.
 *
 * Counterpart of the reference's `sdks/typescript` (`VelesDB` client with
 * pluggable backends, `VelesQLBuilder`). The TPU engine is a server-side
 * system, so the single backend is REST (`velesdb_tpu/server/app.py` routes).
 * Zero-dependency: uses the platform `fetch`.
 */

export interface SearchHit {
  id: number;
  score: number;
  payload: Record<string, unknown> | null;
}

export interface Point {
  id: number;
  vector: number[];
  payload?: Record<string, unknown>;
}

export interface SearchOptions {
  k?: number;
  filter?: Record<string, unknown>;
  ef?: number;
  quality?: "fast" | "balanced" | "accurate" | "perfect";
}

export class VelesDBError extends Error {
  constructor(public status: number, message: string) {
    super(message);
  }
}

async function req<T>(url: string, method: string, body?: unknown): Promise<T> {
  const resp = await fetch(url, {
    method,
    headers: body !== undefined ? { "Content-Type": "application/json" } : {},
    body: body !== undefined ? JSON.stringify(body) : undefined,
  });
  const data = (await resp.json()) as Record<string, unknown>;
  if (!resp.ok) {
    throw new VelesDBError(resp.status, String(data["error"] ?? resp.statusText));
  }
  return data as T;
}

export class Collection {
  constructor(private base: string, public readonly name: string) {}

  private url(path: string): string {
    return `${this.base}/collections/${encodeURIComponent(this.name)}${path}`;
  }

  async upsert(points: Point[]): Promise<number> {
    const r = await req<{ upserted: number }>(this.url("/points"), "PUT", {
      points,
    });
    return r.upserted;
  }

  async get(id: number): Promise<Point | null> {
    try {
      return await req<Point>(this.url(`/points/${id}`), "GET");
    } catch (e) {
      if (e instanceof VelesDBError && e.status === 404) return null;
      throw e;
    }
  }

  async delete(id: number): Promise<void> {
    await req(this.url(`/points/${id}`), "DELETE");
  }

  async search(vector: number[], opts: SearchOptions = {}): Promise<SearchHit[]> {
    const r = await req<{ results: SearchHit[] }>(this.url("/search"), "POST", {
      vector,
      ...opts,
    });
    return r.results;
  }

  async searchBatch(vectors: number[][], opts: SearchOptions = {}): Promise<SearchHit[][]> {
    const r = await req<{ results: SearchHit[][] }>(
      this.url("/search/batch"), "POST", { vectors, ...opts });
    return r.results;
  }

  async textSearch(query: string, opts: SearchOptions = {}): Promise<SearchHit[]> {
    const r = await req<{ results: SearchHit[] }>(
      this.url("/search/text"), "POST", { query, ...opts });
    return r.results;
  }

  async hybridSearch(
    vector: number[],
    query: string,
    opts: SearchOptions & { vector_weight?: number } = {},
  ): Promise<SearchHit[]> {
    const r = await req<{ results: SearchHit[] }>(
      this.url("/search/hybrid"), "POST", { vector, query, ...opts });
    return r.results;
  }

  async match(query: string, params?: Record<string, unknown>): Promise<Record<string, unknown>[]> {
    const r = await req<{ rows: Record<string, unknown>[] }>(
      this.url("/match"), "POST", { query, params });
    return r.rows;
  }

  async addEdge(src: number, dst: number, label: string,
                properties?: Record<string, unknown>): Promise<number> {
    const r = await req<{ edge_id: number }>(this.url("/edges"), "POST", {
      src, dst, label, properties,
    });
    return r.edge_id;
  }

  async traverse(start: number, opts: { max_depth?: number; direction?: string; label?: string } = {}) {
    const r = await req<{ nodes: { id: number; depth: number; path_edges: number[] }[] }>(
      this.url("/traverse"), "POST", { start, ...opts });
    return r.nodes;
  }

  /** Engine/index state: kind, delta rows, build status (GET /index). */
  async indexInfo(): Promise<IndexInfo> {
    return req<IndexInfo>(this.url("/index"), "GET");
  }

  /** Configure the search engine (PATCH /index): index_kind
   * "auto" | "exact" | "graph" | "ivf", delta budget, auto-build floor. */
  async configureIndex(opts: {
    index_kind?: "auto" | "exact" | "graph" | "ivf";
    ann_min_rows?: number;
    delta_rebuild_fraction?: number;
  }): Promise<IndexInfo> {
    return req<IndexInfo>(this.url("/index"), "PATCH", opts);
  }

  /** Force a full rebuild of the graph or ivf index (POST /index/rebuild). */
  async rebuildIndex(kind: "graph" | "ivf" = "graph"): Promise<IndexInfo> {
    return req<IndexInfo>(this.url("/index/rebuild"), "POST", { kind });
  }
}

export interface IndexInfo {
  index_kind: string;
  ann_min_rows: number;
  delta_rebuild_fraction: number;
  graph_built: boolean;
  ivf_built: boolean;
  delta_rows: { graph: number; ivf: number };
  reindex_events: Record<string, unknown>[];
}

export class VelesDB {
  constructor(private base: string = "http://127.0.0.1:7333") {
    this.base = base.replace(/\/$/, "");
  }

  async health(): Promise<{ status: string; collections: number; version: string }> {
    return req(`${this.base}/health`, "GET");
  }

  async createCollection(
    name: string, dim: number,
    opts: { metric?: string; storage_mode?: string } = {},
  ): Promise<Collection> {
    await req(`${this.base}/collections`, "POST", { name, dim, ...opts });
    return new Collection(this.base, name);
  }

  collection(name: string): Collection {
    return new Collection(this.base, name);
  }

  async listCollections(): Promise<string[]> {
    const r = await req<{ collections: { name: string }[] }>(
      `${this.base}/collections`, "GET");
    return r.collections.map((c) => c.name);
  }

  async deleteCollection(name: string): Promise<void> {
    await req(`${this.base}/collections/${encodeURIComponent(name)}`, "DELETE");
  }

  async query(velesql: string, params?: Record<string, unknown>): Promise<Record<string, unknown>[]> {
    const r = await req<{ rows: Record<string, unknown>[] }>(
      `${this.base}/query`, "POST", { query: velesql, params });
    return r.rows;
  }
}

/** Fluent VelesQL builder (`VelesQLBuilder` counterpart). */
export class VelesQLBuilder {
  private parts: string[] = [];
  private whereParts: string[] = [];
  private orderParts: string[] = [];
  private limitN?: number;
  private offsetN?: number;
  private efN?: number;
  readonly params: Record<string, unknown> = {};
  private nParams = 0;

  constructor(private collection: string, private columns: string[] = ["*"]) {}

  private bind(value: unknown): string {
    const name = `p${this.nParams++}`;
    this.params[name] = value;
    return `$${name}`;
  }

  near(field: string, vector: number[]): this {
    this.whereParts.push(`${field} NEAR ${this.bind(vector)}`);
    return this;
  }

  matchText(field: string, query: string): this {
    this.whereParts.push(`${field} MATCH '${query.replace(/'/g, "''")}'`);
    return this;
  }

  where(condition: string): this {
    this.whereParts.push(condition);
    return this;
  }

  similarityAtLeast(field: string, vector: number[], threshold: number): this {
    this.whereParts.push(
      `similarity(${field}, ${this.bind(vector)}) >= ${threshold}`);
    return this;
  }

  orderBy(expr: string, desc = false): this {
    this.orderParts.push(`${expr}${desc ? " DESC" : ""}`);
    return this;
  }

  limit(n: number): this {
    this.limitN = n;
    return this;
  }

  offset(n: number): this {
    this.offsetN = n;
    return this;
  }

  efSearch(ef: number): this {
    this.efN = ef;
    return this;
  }

  build(): { query: string; params: Record<string, unknown> } {
    let q = `SELECT ${this.columns.join(", ")} FROM ${this.collection}`;
    if (this.whereParts.length) q += ` WHERE ${this.whereParts.join(" AND ")}`;
    if (this.orderParts.length) q += ` ORDER BY ${this.orderParts.join(", ")}`;
    if (this.limitN !== undefined) q += ` LIMIT ${this.limitN}`;
    if (this.offsetN !== undefined) q += ` OFFSET ${this.offsetN}`;
    if (this.efN !== undefined) q += ` WITH (ef_search=${this.efN})`;
    return { query: q, params: this.params };
  }

  async run(db: VelesDB): Promise<Record<string, unknown>[]> {
    const { query, params } = this.build();
    return db.query(query, params);
  }
}
