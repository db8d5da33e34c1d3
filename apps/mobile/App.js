// Mobile client for the SLAM point-cloud server (component C13 in
// SURVEY.md §2). The upstream project's mobile app is an empty Expo
// placeholder (Youth.App/Youth.Mobile/App.js renders a static <Text>);
// this one actually talks to the framework: it polls the web viewer
// backend's GET /pointcloud (slam_rgbd_tpu/viz/server.py) and shows live
// map statistics, with pull-to-refresh.
import { useCallback, useEffect, useState } from 'react';
import {
  RefreshControl, ScrollView, StyleSheet, Text, TextInput, View,
} from 'react-native';

const DEFAULT_HOST = 'http://192.168.0.10:8080';

function summarize(cloud) {
  // Payload shape: {positions: flat [x0,y0,z0,x1,...], colors?} — exactly
  // what slam_rgbd_tpu/viz/pointcloud.py:pointcloud_json emits.
  const pos = cloud.positions || [];
  const n = Math.floor(pos.length / 3);
  let minZ = Infinity, maxZ = -Infinity;
  for (let i = 0; i < n; i++) {
    const z = pos[3 * i + 2];
    if (z < minZ) minZ = z;
    if (z > maxZ) maxZ = z;
  }
  return { n, minZ: n ? minZ : 0, maxZ: n ? maxZ : 0 };
}

export default function App() {
  // The input edits a DRAFT; `host` only commits on submit, so typing in
  // the field never fires fetches at partially-typed URLs.
  const [draft, setDraft] = useState(DEFAULT_HOST);
  const [host, setHost] = useState(DEFAULT_HOST);
  const [stats, setStats] = useState(null);
  const [error, setError] = useState(null);
  const [refreshing, setRefreshing] = useState(false);

  const load = useCallback(async (target) => {
    setRefreshing(true);
    try {
      const r = await fetch(`${target}/pointcloud`);
      if (!r.ok) throw new Error(`HTTP ${r.status}`);
      setStats(summarize(await r.json()));
      setError(null);
    } catch (e) {
      setError(String(e));
    } finally {
      setRefreshing(false);
    }
  }, []);

  // fetch on mount only; afterwards on submit or pull-to-refresh
  useEffect(() => { load(DEFAULT_HOST); }, [load]);

  const submit = useCallback(() => {
    setHost(draft);
    load(draft);
  }, [draft, load]);
  const refresh = useCallback(() => { load(host); }, [host, load]);

  return (
    <ScrollView
      contentContainerStyle={styles.container}
      refreshControl={<RefreshControl refreshing={refreshing} onRefresh={refresh} />}
    >
      <Text style={styles.title}>slam-rgbd-tpu</Text>
      <Text style={styles.label}>viewer server</Text>
      <TextInput
        style={styles.input}
        value={draft}
        onChangeText={setDraft}
        autoCapitalize="none"
        onSubmitEditing={submit}
      />
      {error && <Text style={styles.error}>{error}</Text>}
      {stats && (
        <View style={styles.card}>
          <Text style={styles.stat}>map points: {stats.n}</Text>
          <Text style={styles.stat}>
            depth range: {stats.minZ.toFixed(2)} … {stats.maxZ.toFixed(2)} m
          </Text>
        </View>
      )}
      <Text style={styles.hint}>pull down to refresh</Text>
    </ScrollView>
  );
}

const styles = StyleSheet.create({
  container: { flexGrow: 1, justifyContent: 'center', padding: 24, backgroundColor: '#101418' },
  title: { fontSize: 28, fontWeight: '700', color: '#e8eef4', marginBottom: 16 },
  label: { color: '#8fa1b3', marginBottom: 4 },
  input: {
    borderWidth: 1, borderColor: '#2c3640', borderRadius: 8, color: '#e8eef4',
    padding: 10, marginBottom: 16,
  },
  card: { backgroundColor: '#1a222b', borderRadius: 8, padding: 16, marginBottom: 16 },
  stat: { color: '#e8eef4', fontSize: 16, marginBottom: 4 },
  error: { color: '#ff7a7a', marginBottom: 16 },
  hint: { color: '#5c6b7a', textAlign: 'center' },
});
