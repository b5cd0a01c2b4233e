package chronon.testing;

/*
 * A minimal-but-real DataSource V2 catalog: an in-memory, snapshot-versioned,
 * identity-partitioned table provider used to EXECUTE the engine's V2 write
 * branch (CatalogTable with format="iceberg") in a sandbox with no Iceberg
 * runtime jar. It is a test double in the sense that storage is a JVM map,
 * not files — but every Spark-facing surface is the genuine DSv2 protocol:
 *
 *   - TableCatalog create/load/alter/rename/drop
 *   - df.writeTo(t).create() / .append() / .overwritePartitions()
 *     (real distributed writes: DataWriterFactory on executors, commit
 *     messages back to the driver, dynamic-partition-overwrite semantics
 *     resolved at commit)
 *   - snapshot-versioned reads with `option("versionAsOf", n)` time travel
 *     (TableCatalog.loadTable(ident, version))
 *   - `t.partitions` / `t.snapshots` metadata tables (the Iceberg listing
 *     surface the engine queries — SELECT partition.`ds` FROM t.partitions)
 *   - CALL cat.system.rewrite_data_files / expire_snapshots stored
 *     procedures (Spark 4 ProcedureCatalog), with honest semantics over the
 *     in-memory "files": compaction really merges per-partition file lists
 *     into one and commits a replace snapshot; expiry really drops history.
 *
 * Mirrors the role of Apache Iceberg's Spark runtime for the surface used in
 * chronon_spark/plans/table_lifecycle.py (CatalogTable), and of Spark's own
 * in-memory test catalog (sql/catalyst test scope, not shipped in the
 * binary distro — hence this reimplementation).
 *
 * Storage is per-JVM static state: correct for local[*] (driver and
 * executors share the JVM) which is the only mode this sandbox runs;
 * a multi-JVM cluster would need commit messages only (writes already
 * flow through them) plus a driver-side map, which is exactly where a
 * real catalog would put a metastore round-trip.
 */

import java.io.Serializable;
import java.util.ArrayList;
import java.util.Arrays;
import java.util.Collections;
import java.util.HashMap;
import java.util.HashSet;
import java.util.Iterator;
import java.util.LinkedHashMap;
import java.util.List;
import java.util.Map;
import java.util.Set;
import java.util.concurrent.ConcurrentHashMap;

import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException;
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException;
import org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException;
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow;
import org.apache.spark.sql.connector.catalog.Identifier;
import org.apache.spark.sql.connector.catalog.ProcedureCatalog;
import org.apache.spark.sql.connector.catalog.SupportsNamespaces;
import org.apache.spark.sql.connector.catalog.SupportsRead;
import org.apache.spark.sql.connector.catalog.SupportsWrite;
import org.apache.spark.sql.connector.catalog.Table;
import org.apache.spark.sql.connector.catalog.TableCapability;
import org.apache.spark.sql.connector.catalog.TableCatalog;
import org.apache.spark.sql.connector.catalog.TableChange;
import org.apache.spark.sql.connector.catalog.procedures.BoundProcedure;
import org.apache.spark.sql.connector.catalog.procedures.ProcedureParameter;
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure;
import org.apache.spark.sql.connector.expressions.Expressions;
import org.apache.spark.sql.connector.expressions.Transform;
import org.apache.spark.sql.connector.read.Batch;
import org.apache.spark.sql.connector.read.InputPartition;
import org.apache.spark.sql.connector.read.LocalScan;
import org.apache.spark.sql.connector.read.PartitionReader;
import org.apache.spark.sql.connector.read.PartitionReaderFactory;
import org.apache.spark.sql.connector.read.Scan;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.connector.write.BatchWrite;
import org.apache.spark.sql.connector.write.DataWriter;
import org.apache.spark.sql.connector.write.DataWriterFactory;
import org.apache.spark.sql.connector.write.LogicalWriteInfo;
import org.apache.spark.sql.connector.write.PhysicalWriteInfo;
import org.apache.spark.sql.connector.write.SupportsDynamicOverwrite;
import org.apache.spark.sql.connector.write.SupportsTruncate;
import org.apache.spark.sql.connector.write.Write;
import org.apache.spark.sql.connector.write.WriteBuilder;
import org.apache.spark.sql.connector.write.WriterCommitMessage;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.StructField;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;
import org.apache.spark.unsafe.types.UTF8String;

public class MemCatalog implements TableCatalog, SupportsNamespaces, ProcedureCatalog {

  /** joins multi-column partition values into one map key, unambiguously */
  static final String SEP = "\u0001";

  // ------------------------------------------------------------- storage

  static final class DataFile implements Serializable {
    final String[] partValues;          // rendered, aligned with partCols
    final StructType writeSchema;       // schema the rows were written with
    final List<InternalRow> rows;
    DataFile(String[] partValues, StructType writeSchema, List<InternalRow> rows) {
      this.partValues = partValues;
      this.writeSchema = writeSchema;
      this.rows = rows;
    }
  }

  static final class Snapshot implements Serializable {
    final long id;
    final long committedAtMicros;
    final String operation;
    final List<DataFile> files;
    Snapshot(long id, long us, String op, List<DataFile> files) {
      this.id = id; this.committedAtMicros = us; this.operation = op; this.files = files;
    }
  }

  /** Mutable shared state of one table; MemTable views (live or pinned) share it. */
  static final class TableState {
    final String key;
    StructType schema;
    final List<String> partCols;
    final Map<String, String> properties = new LinkedHashMap<>();
    final List<Snapshot> snapshots = new ArrayList<>();
    long nextId = 1;
    TableState(String key, StructType schema, List<String> partCols) {
      this.key = key; this.schema = schema; this.partCols = partCols;
    }
    synchronized List<DataFile> filesAt(int version) {  // version: snapshot id, -1 = live
      if (snapshots.isEmpty()) return Collections.emptyList();
      if (version < 0) return snapshots.get(snapshots.size() - 1).files;
      for (Snapshot s : snapshots) if (s.id == version) return s.files;
      throw new IllegalArgumentException(
          "no snapshot version " + version + " (expired or never committed)");
    }
    synchronized void commit(String op, List<DataFile> files) {
      snapshots.add(new Snapshot(nextId++, System.currentTimeMillis() * 1000L, op, files));
    }
  }

  private static final ConcurrentHashMap<String, TableState> TABLES = new ConcurrentHashMap<>();
  private static final Set<String> NAMESPACES = ConcurrentHashMap.newKeySet();

  private String catalogName = "memtest";

  private String key(Identifier ident) {
    return catalogName + " " + String.join(".", ident.namespace()) + " " + ident.name();
  }

  // ------------------------------------------------------- CatalogPlugin

  @Override
  public void initialize(String name, CaseInsensitiveStringMap options) {
    this.catalogName = name;
  }

  @Override
  public String name() {
    return catalogName;
  }

  // -------------------------------------------------------- TableCatalog

  @Override
  public Identifier[] listTables(String[] namespace) {
    String pre = catalogName + " " + String.join(".", namespace) + " ";
    List<Identifier> out = new ArrayList<>();
    for (String k : TABLES.keySet()) {
      if (k.startsWith(pre)) out.add(Identifier.of(namespace, k.substring(pre.length())));
    }
    return out.toArray(new Identifier[0]);
  }

  @Override
  public Table loadTable(Identifier ident) throws NoSuchTableException {
    TableState st = TABLES.get(key(ident));
    if (st != null) return new MemTable(st, -1);
    // metadata tables: <ns>.<table>.partitions / .snapshots
    String meta = ident.name().toLowerCase();
    if ((meta.equals("partitions") || meta.equals("snapshots")) && ident.namespace().length >= 1) {
      String[] ns = ident.namespace();
      Identifier base = Identifier.of(Arrays.copyOf(ns, ns.length - 1), ns[ns.length - 1]);
      TableState bst = TABLES.get(key(base));
      if (bst != null) return new MetaTable(bst, meta);
    }
    throw new NoSuchTableException(ident);
  }

  @Override
  public Table loadTable(Identifier ident, String version) throws NoSuchTableException {
    TableState st = TABLES.get(key(ident));
    if (st == null) throw new NoSuchTableException(ident);
    return new MemTable(st, Integer.parseInt(version));
  }

  @Override
  public Table loadTable(Identifier ident, long timestampMicros) throws NoSuchTableException {
    TableState st = TABLES.get(key(ident));
    if (st == null) throw new NoSuchTableException(ident);
    int v = -1;
    synchronized (st) {
      for (Snapshot s : st.snapshots) if (s.committedAtMicros <= timestampMicros) v = (int) s.id;
    }
    if (v < 0) throw new IllegalArgumentException("no snapshot at or before " + timestampMicros);
    return new MemTable(st, v);
  }

  @Override
  public Table createTable(Identifier ident, StructType schema, Transform[] partitions,
      Map<String, String> properties) throws TableAlreadyExistsException {
    String k = key(ident);
    List<String> partCols = new ArrayList<>();
    for (Transform t : partitions) {
      if (!t.name().equals("identity")) {
        throw new UnsupportedOperationException("MemCatalog supports identity partitioning only, got " + t);
      }
      partCols.add(t.references()[0].fieldNames()[0]);
    }
    TableState st = new TableState(k, schema, partCols);
    for (Map.Entry<String, String> e : properties.entrySet()) {
      // provider/owner etc. arrive here too; keep everything, it is listed
      // back through SHOW TBLPROPERTIES just like a real catalog
      st.properties.put(e.getKey(), e.getValue());
    }
    if (TABLES.putIfAbsent(k, st) != null) throw new TableAlreadyExistsException(ident);
    NAMESPACES.add(String.join(".", ident.namespace()));
    return new MemTable(st, -1);
  }

  @Override
  public Table alterTable(Identifier ident, TableChange... changes) throws NoSuchTableException {
    TableState st = TABLES.get(key(ident));
    if (st == null) throw new NoSuchTableException(ident);
    synchronized (st) {
      for (TableChange ch : changes) {
        if (ch instanceof TableChange.SetProperty) {
          TableChange.SetProperty sp = (TableChange.SetProperty) ch;
          st.properties.put(sp.property(), sp.value());
        } else if (ch instanceof TableChange.RemoveProperty) {
          st.properties.remove(((TableChange.RemoveProperty) ch).property());
        } else if (ch instanceof TableChange.AddColumn) {
          TableChange.AddColumn ac = (TableChange.AddColumn) ch;
          if (ac.fieldNames().length != 1) {
            throw new UnsupportedOperationException("nested ADD COLUMNS not supported");
          }
          st.schema = st.schema.add(ac.fieldNames()[0], ac.dataType(), true);
        } else {
          throw new UnsupportedOperationException("unsupported table change " + ch);
        }
      }
    }
    return new MemTable(st, -1);
  }

  @Override
  public boolean dropTable(Identifier ident) {
    return TABLES.remove(key(ident)) != null;
  }

  @Override
  public void renameTable(Identifier from, Identifier to)
      throws NoSuchTableException, TableAlreadyExistsException {
    TableState st = TABLES.get(key(from));
    if (st == null) throw new NoSuchTableException(from);
    // Spark's RENAME TO passes the target verbatim, catalog prefix and all
    // (ALTER TABLE cat.db.t RENAME TO cat.db.t2 arrives as ns=[cat,db]):
    // strip a leading element equal to this catalog's name so the renamed
    // table stays addressable as cat.db.t2
    if (to.namespace().length > 0 && to.namespace()[0].equals(catalogName)) {
      to = Identifier.of(Arrays.copyOfRange(to.namespace(), 1, to.namespace().length), to.name());
    }
    if (TABLES.putIfAbsent(key(to), st) != null) throw new TableAlreadyExistsException(to);
    TABLES.remove(key(from));
  }

  // --------------------------------------------------- SupportsNamespaces

  @Override
  public String[][] listNamespaces() {
    List<String[]> out = new ArrayList<>();
    for (String ns : NAMESPACES) out.add(ns.split("\\."));
    return out.toArray(new String[0][]);
  }

  @Override
  public String[][] listNamespaces(String[] namespace) throws NoSuchNamespaceException {
    return new String[0][];
  }

  @Override
  public Map<String, String> loadNamespaceMetadata(String[] namespace) {
    // every namespace "exists": this catalog has no namespace-level metadata
    return Collections.emptyMap();
  }

  @Override
  public void createNamespace(String[] namespace, Map<String, String> metadata) {
    NAMESPACES.add(String.join(".", namespace));
  }

  @Override
  public void alterNamespace(String[] namespace, org.apache.spark.sql.connector.catalog.NamespaceChange... changes) {
    throw new UnsupportedOperationException("alterNamespace");
  }

  @Override
  public boolean dropNamespace(String[] namespace, boolean cascade) {
    return NAMESPACES.remove(String.join(".", namespace));
  }

  // ---------------------------------------------------- ProcedureCatalog

  @Override
  public Identifier[] listProcedures(String[] namespace) {
    return new Identifier[] {
      Identifier.of(new String[] {"system"}, "rewrite_data_files"),
      Identifier.of(new String[] {"system"}, "expire_snapshots"),
    };
  }

  @Override
  public UnboundProcedure loadProcedure(Identifier ident) {
    String n = ident.name().toLowerCase();
    if (n.equals("rewrite_data_files")) return new RewriteDataFiles(this);
    if (n.equals("expire_snapshots")) return new ExpireSnapshots(this);
    throw new UnsupportedOperationException("no procedure " + ident);
  }

  TableState stateOf(String tableName) {
    // procedure arg is the dotted name, catalog prefix optional
    String[] parts = tableName.split("\\.");
    int start = parts[0].equals(catalogName) ? 1 : 0;
    String[] ns = Arrays.copyOfRange(parts, start, parts.length - 1);
    Identifier ident = Identifier.of(ns, parts[parts.length - 1]);
    TableState st = TABLES.get(key(ident));
    if (st == null) throw new IllegalArgumentException("no such table " + tableName);
    return st;
  }

  // ============================================================ the table

  static final class MemTable implements Table, SupportsRead, SupportsWrite {
    final TableState st;
    final int pinned;  // -1 = live head, else 1-based snapshot id

    MemTable(TableState st, int pinned) {
      this.st = st; this.pinned = pinned;
    }

    @Override public String name() { return st.key.replace(' ', '.'); }
    @Override public StructType schema() { return st.schema; }
    @Override public Map<String, String> properties() { return new HashMap<>(st.properties); }

    @Override
    public Transform[] partitioning() {
      Transform[] out = new Transform[st.partCols.size()];
      for (int i = 0; i < out.length; i++) out[i] = Expressions.identity(st.partCols.get(i));
      return out;
    }

    @Override
    public Set<TableCapability> capabilities() {
      return new HashSet<>(Arrays.asList(
          TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
          TableCapability.OVERWRITE_DYNAMIC, TableCapability.TRUNCATE));
    }

    @Override
    public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
      final List<DataFile> files = st.filesAt(pinned);
      final StructType schema = st.schema;
      return () -> new MemScan(schema, files);
    }

    @Override
    public WriteBuilder newWriteBuilder(LogicalWriteInfo info) {
      if (pinned >= 0) throw new UnsupportedOperationException("cannot write to a pinned snapshot");
      return new MemWriteBuilder(st, info.schema());
    }
  }

  // ---------------------------------------------------------------- scan

  static final class MemScan implements Scan, Batch {
    final StructType schema;
    final List<DataFile> files;
    MemScan(StructType schema, List<DataFile> files) { this.schema = schema; this.files = files; }

    @Override public StructType readSchema() { return schema; }
    @Override public Batch toBatch() { return this; }
    @Override public String description() { return "MemScan(" + files.size() + " files)"; }

    @Override
    public InputPartition[] planInputPartitions() {
      InputPartition[] out = new InputPartition[files.size()];
      for (int i = 0; i < files.size(); i++) out[i] = new MemInputPartition(files.get(i), schema);
      return out;
    }

    @Override
    public PartitionReaderFactory createReaderFactory() {
      return new MemReaderFactory();
    }
  }

  static final class MemInputPartition implements InputPartition {
    final DataFile file;
    final StructType readSchema;
    MemInputPartition(DataFile file, StructType readSchema) {
      this.file = file; this.readSchema = readSchema;
    }
  }

  static final class MemReaderFactory implements PartitionReaderFactory {
    @Override
    public PartitionReader<InternalRow> createReader(InputPartition partition) {
      MemInputPartition p = (MemInputPartition) partition;
      // project the file's write-time schema onto the CURRENT table schema
      // by name: columns added after the write read as NULL (auto-expand)
      StructType ws = p.file.writeSchema;
      int n = p.readSchema.fields().length;
      int[] src = new int[n];
      DataType[] types = new DataType[n];
      for (int i = 0; i < n; i++) {
        StructField f = p.readSchema.fields()[i];
        src[i] = -1;
        types[i] = f.dataType();
        for (int j = 0; j < ws.fields().length; j++) {
          if (ws.fields()[j].name().equals(f.name())) { src[i] = j; break; }
        }
      }
      Iterator<InternalRow> it = p.file.rows.iterator();
      return new PartitionReader<InternalRow>() {
        InternalRow current;
        @Override public boolean next() {
          if (!it.hasNext()) return false;
          InternalRow raw = it.next();
          Object[] vals = new Object[n];
          for (int i = 0; i < n; i++) {
            vals[i] = (src[i] >= 0 && !raw.isNullAt(src[i])) ? raw.get(src[i], types[i]) : null;
          }
          current = new GenericInternalRow(vals);
          return true;
        }
        @Override public InternalRow get() { return current; }
        @Override public void close() {}
      };
    }
  }

  // --------------------------------------------------------------- write

  static final class MemWriteBuilder implements WriteBuilder, SupportsDynamicOverwrite, SupportsTruncate {
    final TableState st;
    final StructType writeSchema;
    String mode = "append";

    MemWriteBuilder(TableState st, StructType writeSchema) {
      this.st = st; this.writeSchema = writeSchema;
    }

    @Override public WriteBuilder overwriteDynamicPartitions() { mode = "overwrite_dynamic"; return this; }
    @Override public WriteBuilder truncate() { mode = "truncate"; return this; }

    @Override
    public Write build() {
      return new Write() {
        @Override public BatchWrite toBatch() { return new MemBatchWrite(st, writeSchema, mode); }
        @Override public String description() { return "MemWrite(" + mode + ")"; }
      };
    }
  }

  static final class MemBatchWrite implements BatchWrite {
    final TableState st;
    final StructType writeSchema;
    final String mode;
    MemBatchWrite(TableState st, StructType writeSchema, String mode) {
      this.st = st; this.writeSchema = writeSchema; this.mode = mode;
    }

    @Override
    public DataWriterFactory createBatchWriterFactory(PhysicalWriteInfo info) {
      int[] partIdx = new int[st.partCols.size()];
      DataType[] partTypes = new DataType[st.partCols.size()];
      for (int i = 0; i < partIdx.length; i++) {
        partIdx[i] = writeSchema.fieldIndex(st.partCols.get(i));
        partTypes[i] = writeSchema.fields()[partIdx[i]].dataType();
      }
      return new MemWriterFactory(writeSchema, partIdx, partTypes);
    }

    @Override
    public void commit(WriterCommitMessage[] messages) {
      // group incoming rows into one DataFile per (task, partition); commit
      // a snapshot whose file list reflects the write mode
      Map<String, DataFile> incoming = new LinkedHashMap<>();
      Set<String> touched = new HashSet<>();
      for (WriterCommitMessage m : messages) {
        if (m == null) continue;
        Map<String, List<InternalRow>> byPartition;
        long taskId;
        try {
          // read reflectively, not cast: under runtime ADD JAR the task-result
          // deserializer and the catalog instance live in different mutable
          // classloaders, so MemCommit-the-class is not unique in the JVM.
          // The payload is JDK + Spark-parent types, which ARE unique.
          java.lang.reflect.Field fp = m.getClass().getDeclaredField("byPartition");
          java.lang.reflect.Field ft = m.getClass().getDeclaredField("taskId");
          fp.setAccessible(true);
          ft.setAccessible(true);
          @SuppressWarnings("unchecked")
          Map<String, List<InternalRow>> bp = (Map<String, List<InternalRow>>) fp.get(m);
          byPartition = bp;
          taskId = ft.getLong(m);
        } catch (ReflectiveOperationException ex) {
          throw new IllegalStateException("unexpected commit message " + m.getClass(), ex);
        }
        for (Map.Entry<String, List<InternalRow>> e : byPartition.entrySet()) {
          touched.add(e.getKey());
          String fileKey = e.getKey() + " task" + taskId;
          DataFile f = incoming.computeIfAbsent(fileKey,
              k -> new DataFile(e.getKey().split(SEP, -1), writeSchema, new ArrayList<>()));
          f.rows.addAll(e.getValue());
        }
      }
      synchronized (st) {
        List<DataFile> base;
        if (mode.equals("truncate")) {
          base = new ArrayList<>();
        } else if (mode.equals("overwrite_dynamic")) {
          base = new ArrayList<>();
          for (DataFile f : st.filesAt(-1)) {
            if (!touched.contains(String.join(SEP, f.partValues))) base.add(f);
          }
        } else {
          base = new ArrayList<>(st.filesAt(-1));
        }
        base.addAll(incoming.values());
        st.commit(mode, base);
      }
    }

    @Override public void abort(WriterCommitMessage[] messages) {}
  }

  static final class MemWriterFactory implements DataWriterFactory {
    final StructType writeSchema;
    final int[] partIdx;
    final DataType[] partTypes;
    MemWriterFactory(StructType writeSchema, int[] partIdx, DataType[] partTypes) {
      this.writeSchema = writeSchema; this.partIdx = partIdx; this.partTypes = partTypes;
    }

    @Override
    public DataWriter<InternalRow> createWriter(int partitionId, long taskId) {
      return new DataWriter<InternalRow>() {
        final Map<String, List<InternalRow>> byPartition = new LinkedHashMap<>();
        @Override
        public void write(InternalRow row) {
          String[] pv = new String[partIdx.length];
          for (int i = 0; i < partIdx.length; i++) {
            pv[i] = row.isNullAt(partIdx[i]) ? "__NULL__"
                : String.valueOf(row.get(partIdx[i], partTypes[i]));
          }
          byPartition.computeIfAbsent(String.join(SEP, pv), k -> new ArrayList<>())
              .add(row.copy());
        }
        @Override
        public WriterCommitMessage commit() { return new MemCommit(taskId, byPartition); }
        @Override public void abort() {}
        @Override public void close() {}
      };
    }
  }

  static final class MemCommit implements WriterCommitMessage {
    final long taskId;
    final Map<String, List<InternalRow>> byPartition;
    MemCommit(long taskId, Map<String, List<InternalRow>> byPartition) {
      this.taskId = taskId; this.byPartition = byPartition;
    }
  }

  // ------------------------------------------------------ metadata tables

  static final class MetaTable implements Table, SupportsRead {
    final TableState st;
    final String kind;  // "partitions" | "snapshots"
    MetaTable(TableState st, String kind) { this.st = st; this.kind = kind; }

    @Override public String name() { return st.key.replace(' ', '.') + "." + kind; }

    @Override
    public StructType schema() {
      if (kind.equals("partitions")) {
        StructType pt = new StructType();
        for (String c : st.partCols) {
          DataType dt = DataTypes.StringType;
          for (StructField f : st.schema.fields()) if (f.name().equals(c)) dt = f.dataType();
          pt = pt.add(c, dt, true);
        }
        return new StructType()
            .add("partition", pt, false)
            .add("record_count", DataTypes.LongType, false)
            .add("file_count", DataTypes.IntegerType, false);
      }
      return new StructType()
          .add("committed_at", DataTypes.TimestampType, false)
          .add("snapshot_id", DataTypes.LongType, false)
          .add("operation", DataTypes.StringType, false)
          .add("file_count", DataTypes.IntegerType, false);
    }

    @Override
    public Set<TableCapability> capabilities() {
      return Collections.singleton(TableCapability.BATCH_READ);
    }

    @Override
    public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
      final StructType schema = schema();
      final List<InternalRow> rows = new ArrayList<>();
      synchronized (st) {
        if (kind.equals("partitions")) {
          // one row per live partition, straight off snapshot metadata —
          // no data scan, same contract as Iceberg's partitions table
          Map<String, long[]> agg = new LinkedHashMap<>();  // part -> [rows, files]
          for (DataFile f : st.filesAt(-1)) {
            long[] a = agg.computeIfAbsent(String.join(SEP, f.partValues), k -> new long[2]);
            a[0] += f.rows.size();
            a[1] += 1;
          }
          StructType pt = (StructType) schema.fields()[0].dataType();
          for (Map.Entry<String, long[]> e : agg.entrySet()) {
            String[] pv = e.getKey().split(SEP, -1);
            Object[] pvals = new Object[pv.length];
            for (int i = 0; i < pv.length; i++) {
              pvals[i] = pv[i].equals("__NULL__") ? null : internalValue(pt.fields()[i].dataType(), pv[i]);
            }
            rows.add(new GenericInternalRow(new Object[] {
                new GenericInternalRow(pvals), e.getValue()[0], (int) e.getValue()[1]}));
          }
        } else {
          for (Snapshot s : st.snapshots) {
            rows.add(new GenericInternalRow(new Object[] {
                s.committedAtMicros, s.id, UTF8String.fromString(s.operation), s.files.size()}));
          }
        }
      }
      final InternalRow[] arr = rows.toArray(new InternalRow[0]);
      return () -> new LocalScan() {
        @Override public InternalRow[] rows() { return arr; }
        @Override public StructType readSchema() { return schema; }
        @Override public String description() { return "MemMetaScan(" + kind + ")"; }
      };
    }

    static Object internalValue(DataType dt, String rendered) {
      if (dt == DataTypes.StringType) return UTF8String.fromString(rendered);
      if (dt == DataTypes.IntegerType) return Integer.parseInt(rendered);
      if (dt == DataTypes.LongType) return Long.parseLong(rendered);
      if (dt == DataTypes.DateType) return Integer.parseInt(rendered);  // stored internal
      return UTF8String.fromString(rendered);
    }
  }

  // ----------------------------------------------------------- procedures

  abstract static class BaseProcedure implements UnboundProcedure, BoundProcedure {
    final MemCatalog catalog;
    BaseProcedure(MemCatalog catalog) { this.catalog = catalog; }
    @Override public BoundProcedure bind(StructType inputType) { return this; }
    @Override public boolean isDeterministic() { return false; }

    Iterator<Scan> result(StructType schema, Object[] values) {
      InternalRow row = new GenericInternalRow(values);
      Scan scan = new LocalScan() {
        @Override public InternalRow[] rows() { return new InternalRow[] {row}; }
        @Override public StructType readSchema() { return schema; }
      };
      return Collections.singletonList(scan).iterator();
    }
  }

  /** CALL cat.system.rewrite_data_files(table => 't', options => map(...)):
   *  merges each partition's file list into a single file and commits a
   *  "replace" snapshot — live rows unchanged, file count drops. */
  static final class RewriteDataFiles extends BaseProcedure {
    RewriteDataFiles(MemCatalog c) { super(c); }
    @Override public String name() { return "rewrite_data_files"; }

    @Override
    public ProcedureParameter[] parameters() {
      return new ProcedureParameter[] {
        ProcedureParameter.in("table", DataTypes.StringType).build(),
        ProcedureParameter.in("options",
            DataTypes.createMapType(DataTypes.StringType, DataTypes.StringType))
            .defaultValue("map()").build(),
      };
    }

    @Override
    public Iterator<Scan> call(InternalRow input) {
      TableState st = catalog.stateOf(input.getUTF8String(0).toString());
      int before;
      int after;
      synchronized (st) {
        List<DataFile> files = st.filesAt(-1);
        before = files.size();
        Map<String, DataFile> merged = new LinkedHashMap<>();
        for (DataFile f : files) {
          String k = String.join(SEP, f.partValues);
          DataFile m = merged.get(k);
          if (m == null || !m.writeSchema.equals(f.writeSchema)) {
            // merge only files sharing a write schema; mixed-schema
            // partitions keep one file per schema (still compacted)
            String k2 = k + " " + f.writeSchema.hashCode();
            DataFile m2 = merged.get(k2);
            if (m2 == null) {
              merged.put(m == null ? k : k2,
                  new DataFile(f.partValues, f.writeSchema, new ArrayList<>(f.rows)));
            } else {
              m2.rows.addAll(f.rows);
            }
          } else {
            m.rows.addAll(f.rows);
          }
        }
        after = merged.size();
        st.commit("replace", new ArrayList<>(merged.values()));
      }
      return result(
          new StructType()
              .add("rewritten_data_files_count", DataTypes.IntegerType, false)
              .add("added_data_files_count", DataTypes.IntegerType, false),
          new Object[] {before, after});
    }
  }

  /** CALL cat.system.expire_snapshots(table => 't', retain_last => n):
   *  drops all but the newest n snapshots from history for real — expired
   *  versions become unreadable via versionAsOf, matching Iceberg. */
  static final class ExpireSnapshots extends BaseProcedure {
    ExpireSnapshots(MemCatalog c) { super(c); }
    @Override public String name() { return "expire_snapshots"; }

    @Override
    public ProcedureParameter[] parameters() {
      return new ProcedureParameter[] {
        ProcedureParameter.in("table", DataTypes.StringType).build(),
        ProcedureParameter.in("retain_last", DataTypes.IntegerType).defaultValue("1").build(),
      };
    }

    @Override
    public Iterator<Scan> call(InternalRow input) {
      TableState st = catalog.stateOf(input.getUTF8String(0).toString());
      int keep = Math.max(1, input.getInt(1));
      int dropped;
      synchronized (st) {
        int n = st.snapshots.size();
        dropped = Math.max(0, n - keep);
        if (dropped > 0) st.snapshots.subList(0, dropped).clear();
      }
      return result(
          new StructType().add("deleted_snapshots_count", DataTypes.IntegerType, false),
          new Object[] {dropped});
    }
  }
}
