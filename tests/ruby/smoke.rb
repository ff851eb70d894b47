# End-to-end smoke for the Ruby client, driven by
# tests/test_ruby_client.py. Args: <tcpPort> <httpPort>
# [userId secretKey]. Prints one JSON line with per-step results;
# the pytest side asserts on it.

require "json"
require_relative "../../clients/ruby/sneldb"

def exercise(client, tag, out)
  client.define!("evr_#{tag}", { "amount" => "int", "country" => "string" })
  client.store!("evr_#{tag}", "c1", { "amount" => 10, "country" => "NL" })
  client.store!("evr_#{tag}", "c2", { "amount" => 3, "country" => "BE" })
  client.store!("evr_#{tag}", "c1", { "amount" => 25, "country" => "NL" })
  client.flush!
  rows = client.query!(
    "QUERY evr_#{tag} WHERE amount >= 5 ORDER BY event_id LIMIT 10"
  )
  out["#{tag}_rows"] = rows.map { |r| [r["context_id"], r["amount"], r["country"]] }
  out["#{tag}_ping"] = client.ping!
  client.store_many!(
    "evr_#{tag}",
    (0...7).map { |i| ["b#{i}", { "amount" => 100 + i, "country" => "XX" }] },
    batch_size: 3 # forces 3 BATCH round trips
  )
  client.flush!
  bulk_rows = client.query!(%(QUERY evr_#{tag} WHERE country = "XX"))
  out["#{tag}_bulk_ok"] = bulk_rows.length == 7
  bad = client.execute("BOGUS")
  out["#{tag}_bad_ok"] = bad[:success]
  out["#{tag}_bad_msg_nonempty"] = !bad[:error].to_s.empty?
end

tcp_port, http_port, user_id, secret_key = ARGV
out = {}
opts = user_id ? { user_id: user_id, secret_key: secret_key } : {}

tcp = SnelDB::Client.connect("tcp://127.0.0.1:#{tcp_port}", **opts)
out["token"] = !tcp.authenticate!.to_s.empty? if user_id
exercise(tcp, "tcp", out)
tcp.close

httpc = SnelDB::Client.connect("http://127.0.0.1:#{http_port}", **opts)
exercise(httpc, "http", out)
# cross-transport visibility: HTTP sees what TCP stored
out["cross_rows"] = httpc.query!("QUERY evr_tcp").length
httpc.close

puts JSON.generate(out)
